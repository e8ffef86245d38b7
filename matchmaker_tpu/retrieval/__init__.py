from matchmaker_tpu.retrieval.indexes import BaseNNIndexer, FlatIndex, IVFIndex, DynamicClusterIndex, build_index
