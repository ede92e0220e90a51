"""Catalog / schema-relation layer (worldbase analog)."""
