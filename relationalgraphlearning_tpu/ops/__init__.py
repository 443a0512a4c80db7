from relationalgraphlearning_tpu.ops.sparse import (
    knn_graph,
    knn_graph_auto,
    knn_graph_grid,
    sddmm_fixed_k,
    neighbor_softmax,
    spmm_fixed_k,
    sddmm_edges,
    segment_softmax,
    spmm_edges,
)
