"""NN model layer: sparse linear layers and the reference demo model.

TPU-native analog of the reference's app layer (apps/model.py):

- ``SparseLinear``: a flax module whose kernel is randomly masked to a
  target density at init (apps/model.py:20-44; the reference keeps a scipy
  CSR and multiplies with MKL — here the mask is part of the functional
  init and the forward is a plain masked matmul, XLA-fused).
- ``ThreeLayerFCModel``: dense -> sparse -> sparse with ReLU
  (apps/model.py:57-80).
- ``extract_linears`` / ``AcceleratedModel``: pull the layer weights out of
  flax params and run them through prepared :class:`SpmvHandle`s — the
  layer-swap flow of apps/fpga_layer_manager.py, built in
  hispmv_tpu.models.manager.
- ``compare_model_outputs``: abs/rel error comparison of two model outputs
  (apps/model.py:82-142).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hispmv_tpu.utils.errors import ErrorStats, error_stats


class SparseLinear(nn.Module):
    """Linear layer with a random sparsity mask applied to its kernel.

    ``density`` is the fraction of nonzero weights (apps/model.py:23 uses
    the same convention).  The mask is created once at init from the
    module's RNG and stored as a non-trainable variable, so the layer stays
    sparse under gradient updates.
    """

    features: int
    density: float = 0.1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        mask = self.variable(
            "constants",
            "mask",
            lambda: (
                jax.random.uniform(
                    self.make_rng("params"), (in_features, self.features)
                )
                < self.density
            ).astype(jnp.float32),
        )
        y = jnp.dot(
            x,
            kernel * mask.value,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + bias
        return y


class ThreeLayerFCModel(nn.Module):
    """dense -> ReLU -> sparse -> ReLU -> sparse (apps/model.py:57-80)."""

    hidden: int = 1024
    out: int = 64
    density: float = 0.1

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = SparseLinear(self.hidden, density=self.density)(x)
        x = nn.relu(x)
        x = SparseLinear(self.out, density=self.density)(x)
        return x


def extract_linears(
    variables: dict,
) -> List[Tuple[str, np.ndarray, Optional[np.ndarray]]]:
    """Walk a flax variables tree and return ``(path, W[out,in], bias)`` for
    every Dense/SparseLinear leaf, with sparsity masks applied.

    The analog of the reference's ``named_modules`` walk
    (apps/fpga_layer_manager.py:54-81)."""
    params = variables.get("params", variables)
    constants = variables.get("constants", {})

    out = []

    def walk(p, c, prefix):
        if isinstance(p, dict) and "kernel" in p:
            kernel = np.asarray(p["kernel"], np.float32)
            if isinstance(c, dict) and "mask" in c:
                kernel = kernel * np.asarray(c["mask"], np.float32)
            bias = (
                np.asarray(p["bias"], np.float32) if "bias" in p else None
            )
            # flax kernels are [in, out]; handles want [out, in].
            out.append((prefix, kernel.T, bias))
            return
        if isinstance(p, dict):
            for k, v in p.items():
                walk(v, c.get(k, {}) if isinstance(c, dict) else {},
                     f"{prefix}/{k}" if prefix else k)

    walk(params, constants, "")
    return out


class AcceleratedModel:
    """Eager layer-by-layer executor backed by prepared handles.

    Mirrors the reference's swapped model: every linear layer's forward goes
    through the accelerator (``FpgaLinear.forward`` -> ``fpga.linear``,
    apps/fpga_layer_manager.py:66-78), with activations applied between
    layers on-device via jnp.
    """

    def __init__(
        self,
        layers: Sequence[Tuple[object, Optional[np.ndarray]]],
        activations: Sequence[Optional[Callable]],
    ):
        # layers: [(SpmvHandle, bias), ...]; activations: per layer, applied
        # AFTER the linear (None = identity).
        assert len(layers) == len(activations)
        self.layers = list(layers)
        self.activations = list(activations)

    def __call__(self, x_batch) -> jax.Array:
        y = jnp.asarray(x_batch, jnp.float32)
        for (handle, bias), act in zip(self.layers, self.activations):
            y = handle.linear(y, bias)
            if act is not None:
                y = act(y)
        return y


def compare_model_outputs(
    got, want, rtol: float = 1e-3, atol: float = 1e-4
) -> ErrorStats:
    """Whole-model output comparison (apps/model.py:82-142 analog)."""
    return error_stats(np.asarray(got), np.asarray(want), rtol=rtol, atol=atol)
