"""Scorer cosine backend seam (functions/accel.py): numpy default is
bit-identical to the inline einsum it replaced; the torch path is
exercised through a numpy-backed stub module (torch itself is absent
here by design)."""

import numpy as np
import pytest

from record_matching_ray.functions.accel import (
    NumpyCosine,
    TorchCosine,
    cosine_backend,
)


def _payload(n=200, d=32, seed=0):
    rng = np.random.RandomState(seed)
    emb = rng.randint(-127, 128, size=(n, d)).astype(np.int8)
    norms = np.sqrt(
        np.einsum("ij,ij->i", emb.astype(np.int32), emb.astype(np.int32))
    ).astype(np.float64)
    norms[norms == 0] = 1.0
    return emb, norms


def test_numpy_backend_matches_inline_einsum():
    emb, norms = _payload()
    rng = np.random.RandomState(1)
    li = rng.randint(0, 200, 500)
    ri = rng.randint(0, 200, 500)
    got = cosine_backend(emb, norms, "numpy")(li, ri)
    ref = np.einsum(
        "ij,ij->i", emb[li].astype(np.float32), emb[ri].astype(np.float32)
    ) / (norms[li] * norms[ri])
    assert np.array_equal(got, ref)


class _FakeTensor:
    def __init__(self, a):
        self.a = np.asarray(a)

    def to(self, dev):
        return self

    def float(self):
        return _FakeTensor(self.a.astype(np.float32))

    def __getitem__(self, idx):
        return _FakeTensor(self.a[idx.a if isinstance(idx, _FakeTensor) else idx])

    def __mul__(self, other):
        return _FakeTensor(self.a * other.a)

    def __truediv__(self, other):
        return _FakeTensor(self.a / other.a)

    def sum(self, dim):
        return _FakeTensor(self.a.sum(axis=dim))

    def cpu(self):
        return self

    def numpy(self):
        return self.a


class _FakeTorch:
    """The tiny torch API surface TorchCosine uses, numpy-backed."""

    class cuda:  # noqa: N801 — mimics torch.cuda
        @staticmethod
        def is_available():
            return False

    @staticmethod
    def from_numpy(a):
        return _FakeTensor(a)


def test_torch_backend_code_path_via_stub():
    emb, norms = _payload(seed=2)
    rng = np.random.RandomState(3)
    li = rng.randint(0, 200, 300)
    ri = rng.randint(0, 200, 300)
    tb = TorchCosine(emb, norms, torch_mod=_FakeTorch)
    assert tb.name == "torch:cpu"
    got = tb(li, ri)
    ref = cosine_backend(emb, norms, "numpy")(li, ri)
    # float32 norms in the torch path: equal within a few ulps
    assert np.allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_torch_backend_missing_raises_cleanly():
    emb, norms = _payload()
    with pytest.raises(RuntimeError, match="torch is not installed"):
        cosine_backend(emb, norms, "torch")


def test_auto_falls_back_to_numpy():
    emb, norms = _payload()
    assert cosine_backend(emb, norms, "auto").name == "numpy"


def test_unknown_backend_rejected():
    emb, norms = _payload()
    with pytest.raises(ValueError, match="unknown scorer backend"):
        cosine_backend(emb, norms, "tpu")
