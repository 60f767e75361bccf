from scp_tpu.ops.knn import edge_features, gather_neighbors, knn_indices

__all__ = ["knn_indices", "gather_neighbors", "edge_features"]
