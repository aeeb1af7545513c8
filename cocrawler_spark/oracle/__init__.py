"""Pure-Python reference simulator (the correctness oracle)."""
