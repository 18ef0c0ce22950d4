"""Query plans / strategy choosers / shared demo fixtures."""
