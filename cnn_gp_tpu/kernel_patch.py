"""Kernel-patch value type: one block of an NNGP Gram matrix.

TPU-native redesign of the reference's ``KernelPatch``/``ConvKP``/``NonlinKP``
(reference: cnn_gp/kernel_patch.py:4-89).  Differences by design:

* A single **frozen pytree dataclass** with one canonical layout
  (``xy: [Nx, Ny, W, H]``, ``xx: [Nx, W, H]``, ``yy: [Ny, W, H]``;
  diag: ``xy: [N, W, H]``).  The reference's two mutable layout classes
  exist only to batch torch convs / broadcast torch elementwise math; under
  XLA both are free ``reshape``s inside one traced program, so the layout
  classes disappear.
* ``same``/``diag`` are **static** (hashable aux data), so ``jax.jit``
  specialises per flag combination exactly like the reference's Python
  branches, but once at trace time.
* An optional ``diag_mask [Nx, Ny]`` carries *global* row/column identity
  through the layer stack.  The reference hard-codes the diagonal fix-up to
  ``same=True`` blocks (cnn_gp/kernels.py:155-162), which forces two code
  paths per Gram tile (diagonal vs off-diagonal).  Carrying the mask instead
  lets one compiled program serve every tile of a symmetric Gram matrix --
  the mask is simply all-``False`` for off-diagonal tiles -- which is what a
  GSPMD-sharded tile sweep wants.
* ``+`` and ``*`` (scalar or patch operands, incl. right-ops) mirror the
  reference's elementwise algebra (cnn_gp/kernel_patch.py:31-63) so ``Sum``
  and ``Mixture`` stay one-liners.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["KernelPatch"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class KernelPatch:
    """One block of the kernel matrix, plus row/column variances.

    Attributes:
      xy: cross second moments. ``[Nx, Ny, W, H]`` (or ``[N, W, H]`` when
        ``diag``).
      xx: row variances ``[Nx, W, H]``.
      yy: column variances ``[Ny, W, H]``.
      same: whether rows and columns index the *same* underlying examples
        (the whole matrix is symmetric with this block on its diagonal).
      diag: whether only the blockwise diagonal ``k(x_i, y_i)`` is tracked.
      diag_mask: optional ``[Nx, Ny]`` bool; ``diag_mask[i, j]`` is True iff
        row ``i`` and column ``j`` are the same global example.  ``None``
        means "derive from ``same``" (identity block => eye mask), matching
        the reference behaviour.
    """

    xy: jax.Array
    xx: jax.Array
    yy: jax.Array
    same: bool = False
    diag: bool = False
    diag_mask: Optional[jax.Array] = None

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        if self.diag_mask is None:
            return (self.xy, self.xx, self.yy), (self.same, self.diag, False)
        return (self.xy, self.xx, self.yy, self.diag_mask), (
            self.same, self.diag, True)

    @classmethod
    def tree_unflatten(cls, aux, children):
        same, diag, has_mask = aux
        if has_mask:
            xy, xx, yy, mask = children
        else:
            (xy, xx, yy), mask = children, None
        return cls(xy, xx, yy, same, diag, mask)

    # -- shape helpers -----------------------------------------------------
    @property
    def nx(self) -> int:
        return self.xx.shape[0]

    @property
    def ny(self) -> int:
        return self.yy.shape[0]

    @property
    def spatial(self):
        return self.xy.shape[-2:]

    def resolve_diag_mask(self) -> Optional[jax.Array]:
        """The effective [Nx, Ny] same-example mask, or None if not ``same``.

        Replicates the reference's implicit rule: a ``same`` non-diag block
        is an identity block whose (i, i) entries are the matrix diagonal
        (cnn_gp/kernels.py:160-162).
        """
        if self.diag:
            return None
        if self.diag_mask is not None:
            return self.diag_mask
        if self.same:
            return jnp.eye(self.nx, self.ny, dtype=bool)
        return None

    # -- elementwise algebra (drives Sum / Mixture) ------------------------
    def _zipmap(self, other, op):
        if isinstance(other, KernelPatch):
            assert self.same == other.same and self.diag == other.diag
            return KernelPatch(
                op(self.xy, other.xy), op(self.xx, other.xx),
                op(self.yy, other.yy), self.same, self.diag,
                self.diag_mask if self.diag_mask is not None
                else other.diag_mask)
        return KernelPatch(
            op(self.xy, other), op(self.xx, other), op(self.yy, other),
            self.same, self.diag, self.diag_mask)

    def __add__(self, other):
        if isinstance(other, (int, float)) and other == 0:  # sum() support
            return self
        return self._zipmap(other, jnp.add)

    def __radd__(self, other):
        return self.__add__(other)

    def __mul__(self, other):
        return self._zipmap(other, jnp.multiply)

    def __rmul__(self, other):
        return self.__mul__(other)
