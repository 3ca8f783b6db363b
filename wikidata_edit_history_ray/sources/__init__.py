"""Input readers, synthetic corpus generation, aux dimension tables."""
