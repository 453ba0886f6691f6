"""Training: data pipeline, optimizer/schedule, pjit step, checkpointing."""

from .data import DataLoader, MidiDataset, find_midi_files
from .sched import linear_warmup_decay
from .trainer import (
    TrainState,
    eval_step,
    init_train_state,
    loss_fn,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "DataLoader",
    "MidiDataset",
    "TrainState",
    "eval_step",
    "find_midi_files",
    "init_train_state",
    "linear_warmup_decay",
    "loss_fn",
    "make_optimizer",
    "make_train_step",
]
