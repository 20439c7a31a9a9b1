"""Relational spatial operators: tiling, coverings, PIP joins, kNN."""
