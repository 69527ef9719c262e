"""Core data model: schema compiler + the DcaTable wrapper."""
