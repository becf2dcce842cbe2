from multimodal_registration_tpu.losses.losses import (
    dice_loss,
    dice_loss_zeropad,
    grad_loss,
    mse_loss,
    ncc_loss,
)

__all__ = ["dice_loss", "dice_loss_zeropad", "grad_loss", "mse_loss", "ncc_loss"]
