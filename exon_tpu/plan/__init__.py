"""Logical/physical planning: expressions, plans, pushdowns, pruning."""
