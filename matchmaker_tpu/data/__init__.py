from matchmaker_tpu.data.tokenization import WhitespaceTokenizer, Vocabulary, HuggingfaceTokenizer, build_tokenizer
from matchmaker_tpu.data.readers import (
    read_triples,
    read_reranking_tuples,
    read_id_sequences,
    TripleSample,
    ReRankSample,
)
from matchmaker_tpu.data.batching import collate_text, pad_to_batch
from matchmaker_tpu.data.loaders import (
    triple_training_loader,
    reranking_inference_loader,
    single_sequence_loader,
    device_prefetch,
)
