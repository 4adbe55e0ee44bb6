"""Training layer: state, schedule, fused step, checkpointing, driver."""
from .schedule import log_lerp_lr
from .state import TrainState, init_train_state, make_optimizer
from .step import make_train_step, joint_cadence_step, reference_cadence_step
from .checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint_step
from .trainer import train, evaluate_batch
