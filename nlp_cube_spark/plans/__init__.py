"""Pipeline composition, lineage, and resumability."""
