from emdr2_tpu.models.bert import BertEncoder, DualEncoder  # noqa: F401
from emdr2_tpu.models.emdr2 import EMDR2Batch, EMDR2Model, EMDR2Output  # noqa: F401
from emdr2_tpu.models.t5 import T5Model  # noqa: F401
