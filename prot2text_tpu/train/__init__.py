from .optim import (
    adamw_cosine_warmup, adamw_constant, step_lr, TrainState, apply_updates,
)
from .contrastive import (
    ContrastiveConfig, contrastive_loss, make_contrastive_train_step,
    readout_embeddings, segmented_infonce_loss, batch_infonce_loss,
)
from .sft import SFTConfig, make_sft_train_step
from .legacy import make_legacy_train_step
