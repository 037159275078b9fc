from .metrics import img2mse, img2l1, img2mse_mask, weighted_mse, mse2psnr, to8b

__all__ = ["img2mse", "img2l1", "img2mse_mask", "weighted_mse", "mse2psnr", "to8b"]
