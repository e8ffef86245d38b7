from matchmaker_tpu.ops.kernel_pooling import (
    gaussian_kernel_mus,
    gaussian_kernel_sigmas,
    kernel_activations,
    kernel_pooling_features,
)
