"""L3 utilities: matrix corpus generation, file IO, correctness oracle, timing."""
