"""Multi-device execution: sharded batch decoding and metric collectives."""
from .batch import ShardedCTCDecoder, all_reduce_counts, make_data_mesh

__all__ = ["ShardedCTCDecoder", "all_reduce_counts", "make_data_mesh"]
