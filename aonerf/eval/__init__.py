"""Evaluation: image metrics, tiled rendering, output writers."""

from aonerf.eval.metrics import (  # noqa: F401
    depth_mae_rmse,
    lpips_image,
    masked_psnr,
    mse_legacy,
    psnr_each,
    psnr_image,
    psnr_legacy,
    ssim_each,
    ssim_image,
    ssim_legacy,
    summarize_metric,
)
from aonerf.eval.render import (  # noqa: F401
    make_chunk_renderer,
    make_image_renderer,
    render_rays_chunked,
)
from aonerf.eval.io import (  # noqa: F401
    store_depth_color,
    store_depth_img,
    store_depth_raw,
    store_image,
    store_opacity,
    write_stats,
)
