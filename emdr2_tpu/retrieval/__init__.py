from emdr2_tpu.retrieval.datastore import EmbeddingStore  # noqa: F401
from emdr2_tpu.retrieval.index import ShardedEvidenceIndex  # noqa: F401
