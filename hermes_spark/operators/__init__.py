"""Batch operators of the CDC algebra (all pure DataFrame plans)."""
