"""Reference (.eqx) checkpoint conversion tests.

Real reference weights are not available in this environment (no egress);
these tests validate the converter machinery end-to-end:
- export -> write -> read -> load roundtrips bit-exactly;
- python-scalar field blobs (which equinox interleaves with parameters) are
  skipped by dtype;
- a converted model computes the same function as the reference-structure
  implementation (gecco_tpu.baselines), which mirrors the reference line by
  line.

With real weights present (GECCO_REF_EQX=/path/to/ema.eqx and matching
architecture env vars), test_convert_real_reference_checkpoint runs the
full fetch->convert->eval path — see scripts/convert_ref_checkpoint.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
from gecco_tpu.compat import (
    export_flagship_to_eqx_order,
    load_flagship_from_eqx,
    read_eqx_arrays,
    write_eqx_arrays,
)
from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork


def _model(seed=0, ref_jax_compat=True):
    bk, nk = jax.random.split(jax.random.PRNGKey(seed))
    backbone = SetTransformer.init(
        bk, n_layers=2, feature_dim=64, num_inducers=8, embed_dim=1, num_heads=4,
        compute_dtype=jnp.float32, ref_jax_compat=ref_jax_compat,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=64)
    sched = LogUniformSchedule(sigma_max=10.0, n_solver_steps=8)
    return Diffusion.init(
        net, sched, reparam=GaussianReparam.init([0.1] * 3, [0.9] * 3)
    )


def test_eqx_roundtrip(tmp_path):
    src = _model(seed=1)
    path = str(tmp_path / "ema.eqx")
    write_eqx_arrays(path, export_flagship_to_eqx_order(src))

    dst = load_flagship_from_eqx(_model(seed=2), path)

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 3))
    np.testing.assert_allclose(
        np.asarray(src.denoise(1.0, x)), np.asarray(dst.denoise(1.0, x)), rtol=1e-6
    )
    # and parameters themselves are restored exactly
    for a, b in zip(jax.tree.leaves(src), jax.tree.leaves(dst)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eqx_scalar_blobs_are_skipped(tmp_path):
    """equinox interleaves python-scalar fields (Dropout.p, num_features,
    Schedule.sigma_max, ...) with the parameters; the reader must drop them
    by dtype (float64/int64/bool) while keeping 0-d float32 params (alpha)."""
    src = _model(seed=1)
    arrays = export_flagship_to_eqx_order(src)
    path = str(tmp_path / "ema.eqx")
    with open(path, "wb") as f:
        for i, a in enumerate(arrays):
            # interleave the kinds of scalar blobs eqx 0.10 emits
            np.save(f, np.float64(0.1))
            if i % 3 == 0:
                np.save(f, np.int64(384))
            if i % 5 == 0:
                np.save(f, np.bool_(False))
            np.save(f, a)

    kept = read_eqx_arrays(path)
    assert len(kept) == len(arrays)
    dst = load_flagship_from_eqx(_model(seed=2), path)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 3))
    np.testing.assert_allclose(
        np.asarray(src.denoise(1.0, x)), np.asarray(dst.denoise(1.0, x)), rtol=1e-6
    )


def test_converted_model_matches_reference_structure_impl(tmp_path):
    """After conversion, our fast path and the reference-structure arm agree
    — the chain that will certify chamfer parity once real weights land."""
    from gecco_tpu.baselines import ref_denoise

    src = _model(seed=4)
    path = str(tmp_path / "ema.eqx")
    write_eqx_arrays(path, export_flagship_to_eqx_order(src))
    dst = load_flagship_from_eqx(_model(seed=5), path)

    x = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 3))
    np.testing.assert_allclose(
        np.asarray(dst.denoise(0.7, x)),
        np.asarray(ref_denoise(dst, 0.7, x)),
        rtol=2e-4,
        atol=1e-5,
    )


def test_shape_mismatch_is_loud(tmp_path):
    src = _model(seed=1)
    arrays = export_flagship_to_eqx_order(src)
    arrays[3] = arrays[3][:-1]  # corrupt one parameter's shape
    path = str(tmp_path / "bad.eqx")
    write_eqx_arrays(path, arrays)
    with pytest.raises(ValueError, match="expected shape"):
        load_flagship_from_eqx(_model(seed=2), path)


def test_compat_flag_required(tmp_path):
    src = _model(seed=1)
    path = str(tmp_path / "ema.eqx")
    write_eqx_arrays(path, export_flagship_to_eqx_order(src))
    with pytest.raises(ValueError, match="ref_jax_compat"):
        load_flagship_from_eqx(_model(seed=2, ref_jax_compat=False), path)


@pytest.mark.skipif(
    "GECCO_REF_EQX" not in os.environ,
    reason="set GECCO_REF_EQX=/path/to/reference ema.eqx to run",
)
def test_convert_real_reference_checkpoint(tmp_path):
    """Weights-gated: converts a real reference EMA checkpoint (flagship
    architecture, 6x384x64 heads=8) and sanity-checks the denoiser."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_ref_checkpoint",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "convert_ref_checkpoint.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    model = mod.convert(os.environ["GECCO_REF_EQX"])
    x = 0.35 * jax.random.normal(jax.random.PRNGKey(0), (2, 2048, 3))
    out = np.asarray(model.denoise(1.0, x))
    assert np.isfinite(out).all()
    # D(x; sigma) of a trained EDM model contracts toward the data manifold
    assert np.abs(out).mean() < np.abs(np.asarray(x)).mean() * 2
