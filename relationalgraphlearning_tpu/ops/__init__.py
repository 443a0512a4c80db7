from relationalgraphlearning_tpu.ops.sparse import (
    knn_graph,
    sddmm_fixed_k,
    neighbor_softmax,
    spmm_fixed_k,
    sddmm_edges,
    segment_softmax,
    spmm_edges,
)
