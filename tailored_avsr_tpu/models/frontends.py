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
import jax
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

        # BN normalizes in the promoted dtype (f32 while training: running
        # stats are f32), but hands the block's compute dtype back so a bf16
        # trunk stays bf16 — at inference all stats are cast with the params
        # and these astypes are no-ops.
        dt = x.dtype
        residual = x
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        h = bn("bn1")(h).astype(dt)
        h = act(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        h = bn("bn2")(h).astype(dt)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual).astype(dt)
        return act(h + residual)


class _StemKernel(nn.Module):
    """Owns the stem conv kernel at <name>/kernel, matching nn.Conv's tree."""

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (5, 7, 7, 1, 64)
        )


class Conv3dResNet18(nn.Module):
    activation_type: str = "swish"
    bn_axis_name: Optional[str] = None
    stem_s2d: bool = True  # space-to-depth stem evaluation (same params)

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
        # the stem kernel lives at frontend3d_conv/kernel in the ORIGINAL
        # (5, 7, 7, 1, 64) layout — identical param tree to the nn.Conv it
        # replaces (checkpoint / torch-translation compatible)
        w = _StemKernel(name="frontend3d_conv")()
        if self.stem_s2d and video.shape[2] % 2 == 0 and video.shape[3] % 2 == 0:
            # Space-to-depth evaluation of the SAME stem conv: the k=(5,7,7)
            # s=(1,2,2) conv over a 1-channel image runs the MXU at C_in=1 of
            # the 8 input lanes. Factor-2 s2d (stride == factor, so the cell
            # phase is constant) turns it into a k=(5,4,4) s=1 conv over a
            # 4-channel half-res image — identical math, 4x better
            # input-lane utilization. The kernel is rearranged at trace time:
            # pad the 7-tap spatial kernel LEFT with a zero row/col, so tap
            # kh' of the padded kernel reads input row 2h' - 4 + kh'.
            wp = jnp.pad(w, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
            # (5, 4, subH 2, 4, subW 2, 1, 64) -> cells x (subH, subW) channels
            w2 = wp.reshape(5, 4, 2, 4, 2, 1, 64).transpose(0, 1, 3, 2, 4, 5, 6)
            w2 = w2.reshape(5, 4, 4, 4, 64).astype(video.dtype)
            h2, w2_ = video.shape[2] // 2, video.shape[3] // 2
            xs = video.reshape(b, t, h2, 2, w2_, 2).transpose(0, 1, 2, 4, 3, 5)
            xs = xs.reshape(b, t, h2, w2_, 4)
            x = jax.lax.conv_general_dilated(
                xs,
                w2,
                window_strides=(1, 1, 1),
                padding=((2, 2), (2, 1), (2, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        else:
            x = jax.lax.conv_general_dilated(
                video[..., None],
                w.astype(video.dtype),
                window_strides=(1, 2, 2),
                padding=((2, 2), (3, 3), (3, 3)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.bn_axis_name if train else None,
            name="frontend3d_bn",
        )(x).astype(video.dtype)  # keep the trunk in the input compute dtype
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
