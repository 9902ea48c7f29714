from .trainer import Trainer, ssi_align, ssi_loss
