"""Relational/set operators of the engine."""
