"""Optional accelerator backend for the fused scorer's cosine hot loop.

The reference scores pairs on CUDA (weights tensor + sigmoid over all
candidate pairs, record_matching/main.py:494-501; cosine/gather at
:412-432). This engine is CPU-numpy by default — bit-reproducible and
the right choice for this sandbox — but the per-pair embedding
gather+dot is exactly the kernel a GPU deployment would offload, so the
seam is explicit: `cosine_backend(name)` returns a callable the
FusedPairScorer holds per actor.

- "numpy" (default): the existing int8-gather + float32-SIMD einsum.
  Bit-identical to every previous round.
- "torch": holds the SQ8 payload as a device tensor ONCE per actor
  (cuda if available, else cpu), gathers + dots on device per batch.
  torch is NOT installed in this environment — the branch import-tries
  and raises a clear error if asked for explicitly; unit tests exercise
  it through a numpy-backed stub module, so the code path is tested
  here and runnable on a real GPU box unchanged.
- "auto": torch+cuda when importable, else numpy.

Float caveat (documented, not hidden): torch reduces in a different
order than numpy einsum, so scores can differ in the last ulps; near
cfg.edge_threshold a pair can flip. Runs that must be bit-reproducible
across machines should pin "numpy".
"""

from __future__ import annotations

import numpy as np


class NumpyCosine:
    """emb_q: (n, d) int8 SQ8 payload; norms: (n,) float64."""

    name = "numpy"

    def __init__(self, emb_q: np.ndarray, norms: np.ndarray):
        self.emb_q = emb_q
        self.norms = norms

    def __call__(self, li: np.ndarray, ri: np.ndarray) -> np.ndarray:
        # gather stays int8 (the DRAM-bound access); the cache-resident
        # batch upcasts to float32 for numpy's SIMD float dot path
        dots = np.einsum(
            "ij,ij->i",
            self.emb_q[li].astype(np.float32),
            self.emb_q[ri].astype(np.float32),
        )
        return dots / (self.norms[li] * self.norms[ri])


class TorchCosine:
    """Same contract, device-resident payload (one upload per actor)."""

    def __init__(self, emb_q: np.ndarray, norms: np.ndarray, torch_mod=None):
        if torch_mod is None:
            import torch as torch_mod  # noqa: PLC0415 — optional dep
        self.torch = torch_mod
        dev = "cuda" if torch_mod.cuda.is_available() else "cpu"
        self.name = f"torch:{dev}"
        self.emb = torch_mod.from_numpy(np.ascontiguousarray(emb_q)).to(dev)
        self.norms = torch_mod.from_numpy(
            np.ascontiguousarray(norms.astype(np.float32))
        ).to(dev)

    def __call__(self, li: np.ndarray, ri: np.ndarray) -> np.ndarray:
        t = self.torch
        il = t.from_numpy(np.ascontiguousarray(li))
        ir = t.from_numpy(np.ascontiguousarray(ri))
        a = self.emb[il].float()
        b = self.emb[ir].float()
        dots = (a * b).sum(1)
        cos = dots / (self.norms[il] * self.norms[ir])
        return cos.cpu().numpy().astype(np.float64)


def cosine_backend(
    emb_q: np.ndarray,
    norms: np.ndarray,
    name: str = "numpy",
    torch_mod=None,
):
    """Factory: "numpy" | "torch" | "auto" -> per-actor cosine callable."""
    if name == "numpy":
        return NumpyCosine(emb_q, norms)
    if name == "torch":
        try:
            return TorchCosine(emb_q, norms, torch_mod)
        except ImportError as e:
            raise RuntimeError(
                "scorer backend 'torch' requested but torch is not "
                "installed; install torch or use backend='numpy'"
            ) from e
    if name == "auto":
        try:
            import torch as t  # noqa: PLC0415

            if t.cuda.is_available():
                return TorchCosine(emb_q, norms, t)
        except ImportError:
            pass
        return NumpyCosine(emb_q, norms)
    raise ValueError(f"unknown scorer backend {name!r}")
