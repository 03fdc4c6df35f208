from fsvid2vid_tpu.ops.warp import flow_warp, flow_warp_nchw
from fsvid2vid_tpu.ops.cost_volume import cost_volume, cost_volume_mxu, correlation
from fsvid2vid_tpu.ops.batch_conv import batch_conv
from fsvid2vid_tpu.ops.image_ops import (
    channel_norm, upsample_nearest, resize_nearest, resize_bilinear,
    avg_pool, max_pool, adaptive_avg_pool, leaky_relu,
)
from fsvid2vid_tpu.ops.spectral_norm import (
    spectral_normalize, conv_kernel_matrix, dense_kernel_matrix,
)
