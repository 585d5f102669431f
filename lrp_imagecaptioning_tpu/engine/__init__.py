from .losses import cross_entropy_loss, reward_criterion, top1_accuracy
from .train import TrainState, Trainer
