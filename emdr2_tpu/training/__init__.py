from emdr2_tpu.training.losses import (  # noqa: F401
    EMDR2LossAux,
    dpr_in_batch_loss,
    emdr2_retriever_loss,
    emdr2_total_loss,
    kl_div_retriever_loss,
    reader_cross_entropy,
)
