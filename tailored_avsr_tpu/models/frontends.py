"""Visual frontend: Conv3D stem + per-frame ResNet-18 trunk over lip ROIs.

Capability parity with /root/reference/src/frontend/conv3d_resnet18/
conv3d_resnet18.py (Conv3D 1->64 k=(5,7,7) s=(1,2,2) pad=(2,3,3) + BN + Swish +
MaxPool3d k=(1,3,3) s=(1,2,2)) and modules/resnet.py (BasicBlock x[2,2,2,2],
64->512 channels, global average pool -> 512-d per frame). Input: (B, T, 88, 88)
grayscale crops at 25 fps; output (B, T, 512).

TPU-first notes:
- the (B, T) axes are flattened into one batch axis for the 2-D trunk so every
  conv is one large NHWC convolution on the MXU (same trick as the reference's
  threeD_to_2D_tensor, but kept in NHWC which is XLA's native TPU layout).
- BatchNorm supports a cross-replica ``axis_name`` so batch statistics sync
  over the data-parallel mesh (the reference is single-device; SURVEY.md §7
  flags synced BN as required for DP parity).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    activation_type: str = "swish"
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        act = {"relu": nn.relu, "swish": nn.silu, "prelu": nn.leaky_relu}[
            self.activation_type
        ]

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None,
                name=name,
            )

        residual = x
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        h = bn("bn1")(h)
        h = act(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        h = bn("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return act(h + residual)


class Conv3dResNet18(nn.Module):
    activation_type: str = "swish"
    bn_axis_name: Optional[str] = None

    def output_size(self) -> int:
        return 512

    @nn.compact
    def __call__(
        self, video: jnp.ndarray, lengths: jnp.ndarray, *, train: bool = False
    ):
        """(B, T, H, W) grayscale -> (B, T, 512), lengths unchanged."""
        act = {"relu": nn.relu, "swish": nn.silu, "prelu": nn.leaky_relu}[
            self.activation_type
        ]
        b, t = video.shape[0], video.shape[1]
        x = video[..., None]  # (B, T, H, W, 1) = 3-D conv NDHWC with D=time
        x = nn.Conv(
            64,
            kernel_size=(5, 7, 7),
            strides=(1, 2, 2),
            padding=((2, 2), (3, 3), (3, 3)),
            use_bias=False,
            name="frontend3d_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.bn_axis_name if train else None,
            name="frontend3d_bn",
        )(x)
        x = act(x)
        # MaxPool3d k=(1,3,3) s=(1,2,2) pad=(0,1,1): pool over H, W only
        x = nn.max_pool(
            x,
            window_shape=(1, 3, 3),
            strides=(1, 2, 2),
            padding=((0, 0), (1, 1), (1, 1)),
        )
        # flatten (B, T) for the 2-D trunk: (B*T, H', W', 64)
        h, w, c = x.shape[2], x.shape[3], x.shape[4]
        x = x.reshape(b * t, h, w, c)
        stage_planes = (64, 128, 256, 512)
        for si, planes in enumerate(stage_planes):
            for bi in range(2):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BasicBlock(
                    planes,
                    stride=stride,
                    activation_type=self.activation_type,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{si + 1}_block{bi}",
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B*T, 512)
        return x.reshape(b, t, 512), lengths
