"""Layer manager: swap a model's linear layers onto the accelerator.

The ``FpgaLayerManager`` analog (apps/fpga_layer_manager.py):

- ``process_weights`` (:15-50): SparseLinear weights -> sparse handle;
  other linears -> dense handle when density > 0.5, else sparse COO.
- ``replace_layers`` (:54-81): walk the model, substitute accelerated
  layers, raise when device memory is exhausted (:49-50).

Here the walk happens over flax variables (functional params, not mutable
modules) and produces an :class:`AcceleratedModel` that runs each layer
through the :class:`Accelerator`'s prepared handles.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from hispmv_tpu.api.handle import Accelerator
from hispmv_tpu.formats.matrix import coo_from_dense
from hispmv_tpu.models.mlp import AcceleratedModel, extract_linears


class AcceleratorLayerManager:
    """Builds accelerated models from flax variables."""

    def __init__(
        self,
        accelerator: Optional[Accelerator] = None,
        density_threshold: float = 0.5,
    ):
        self.accel = accelerator or Accelerator()
        self.density_threshold = density_threshold

    def process_weights(self, weight: np.ndarray):
        """One layer's weight -> matrix id on the accelerator.

        Density rule mirrors the reference (fpga_layer_manager.py:40-47).
        Raises MemoryError when the accelerator budget is exhausted
        (:49-50 contract)."""
        density = np.count_nonzero(weight) / max(weight.size, 1)
        if density > self.density_threshold:
            mid = self.accel.create_dense_handle(weight)
        else:
            mid = self.accel.create_sparse_handle(coo_from_dense(weight))
        if mid == -1:
            raise MemoryError(
                "accelerator memory budget exhausted while loading layers"
            )
        return mid

    def replace_layers(
        self,
        variables: dict,
        activations: Optional[Sequence[Optional[Callable]]] = None,
    ) -> AcceleratedModel:
        """Extract every linear layer, prepare it, return the accelerated
        model.  ``activations[i]`` is applied after layer i (None =
        identity); defaults to ReLU between layers and identity at the end,
        matching ThreeLayerFCModel."""
        linears = extract_linears(variables)
        if not linears:
            raise ValueError("no linear layers found in variables")
        if activations is None:
            import jax.nn

            activations = [jax.nn.relu] * (len(linears) - 1) + [None]
        layers = []
        self.layer_names: List[str] = []
        for name, w, b in linears:
            mid = self.process_weights(w)
            layers.append((self.accel.handle(mid), b))
            self.layer_names.append(name)
        self.accel.load_matrices()
        return AcceleratedModel(layers, activations)
