"""Pure-Python core: revision parsing, datavalue canonicalization, the page differ,
revert tagging and per-datatype feature functions. Zero Ray dependency so it can be
unit-tested exhaustively and shipped inside any Ray Data UDF."""
