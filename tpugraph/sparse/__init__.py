from tpugraph.sparse.graph import KG, AlignTask, PaddedEdges, SpMMOperator
from tpugraph.sparse.build import (
    build_adjacency,
    coo_normalize,
    coo_from_triples,
    pad_sort_edges,
    build_spmm_operator,
)
