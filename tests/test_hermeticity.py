"""Eager-dispatch hermeticity of ``dryrun_multichip`` (MULTICHIP_r04 class).

Round 4's driver artifact died because ``parallel/seqpar.py`` built its mesh
padding from UNCOMMITTED ``jnp.arange``/``jnp.full``/``jnp.zeros``/
``jnp.asarray`` BEFORE the explicit ``device_put``: uncommitted eager ops
execute on the process-default backend, which during the driver's run was a
broken TPU client (libtpu terminal/client version mismatch), and the eager
``convert_element_type`` crashed the dry run. The round-4 spoof tests
(test_platform_dispatch.py) catch dispatch-ORACLE bugs but cannot catch
eager-DISPATCH leaks — nothing in the suite failed when an op merely landed
on the default backend.

These tests make that failure mode representable: they intercept JAX's
eager-dispatch seam for the duration of ``dryrun_multichip`` and fail on any
eagerly-executed primitive that runs without a mesh-device default and
without all-committed mesh operands. The seam is
``jax._src.dispatch.xla_primitive_callable``: ``apply_primitive`` (the impl
rule behind every eager ``Primitive.bind``) resolves it as a module global
at call time, so patching the module attribute wraps every eager execution
while leaving jit tracing untouched.

Verified to FAIL on the round-4 code (the seqpar padding leak) and pass on
the fixed code (default_device-scoped dryrun phases + committed padding).
"""

import numpy as np
import pytest

import jax

import jax._src.config as _jconfig
import jax._src.dispatch as _jdispatch

import __graft_entry__
from gps_optimize_slam_tpu.parallel import mesh as pmesh


class EagerDispatchRecorder:
    """Wraps the eager-dispatch seam; records every eager primitive
    execution whose placement would fall to the process-default backend.

    Hermetic executions are those where either
      * the current ``jax.default_device`` scope points at an allowed
        (mesh) device — uncommitted creations then commit to it, or
      * every array operand is committed to allowed devices — the op then
        executes on the committed device regardless of the default.
    Everything else would run on the process default, which on the driver
    host may be a broken accelerator client: a violation.
    """

    def __init__(self, allowed_devices):
        self.allowed = frozenset(allowed_devices)
        self.calls = 0
        self.violations = []
        self._orig = _jdispatch.xla_primitive_callable

    def _hermetic(self, args):
        dd = _jconfig.default_device.value
        if dd is not None and dd in self.allowed:
            return True
        arrs = [a for a in args if isinstance(a, jax.Array)]
        return bool(arrs) and all(
            getattr(a, "committed", False)
            and a.sharding.device_set <= self.allowed
            for a in arrs
        )

    def __call__(self, prim, **params):
        fun = self._orig(prim, **params)
        recorder = self

        def wrapper(*args):
            recorder.calls += 1
            if not recorder._hermetic(args):
                import traceback

                repo_frames = [
                    f"{fr.filename.rsplit('/', 1)[-1]}:{fr.lineno}({fr.name})"
                    for fr in traceback.extract_stack()
                    if "/repo/" in fr.filename and "test_hermeticity" not in fr.filename
                ]
                recorder.violations.append(
                    (prim.name, repo_frames[-3:] or ["<no repo frame>"])
                )
            return fun(*args)

        return wrapper


@pytest.fixture
def eager_recorder(monkeypatch):
    # The dryrun builds make_mesh(n_devices=4) deterministically (the first
    # 4 CPU devices of the virtual-8 suite platform).
    allowed = set(pmesh.make_mesh(n_devices=4).devices.flat)
    rec = EagerDispatchRecorder(allowed)
    monkeypatch.setattr(_jdispatch, "xla_primitive_callable", rec)
    yield rec


def test_seam_detects_default_backend_dispatch(eager_recorder):
    """Sanity: the interception seam actually fires and flags an
    uncommitted eager creation (what seqpar's old padding did)."""
    import jax.numpy as jnp

    before = len(eager_recorder.violations)
    jnp.arange(3, dtype=jnp.float32)  # uncommitted → default backend
    assert len(eager_recorder.violations) > before
    with jax.default_device(next(iter(eager_recorder.allowed))):
        before = len(eager_recorder.violations)
        jnp.arange(3, dtype=jnp.float32)  # scoped → mesh device
        assert len(eager_recorder.violations) == before


def test_dryrun_multichip_no_default_backend_dispatch(eager_recorder):
    """THE r04 regression test: during the full driver artifact, every
    eagerly-dispatched op must target a mesh device — via a mesh-device
    default_device scope or all-committed mesh operands. Fails on the
    round-4 code at seqpar's padding (arange/full/zeros/convert) and on
    any future uncommitted eager creation anywhere in the dryrun path."""
    __graft_entry__.dryrun_multichip(4)
    assert eager_recorder.calls > 0, "interception seam never fired"
    assert not eager_recorder.violations, (
        "eager ops executed outside the mesh during dryrun_multichip "
        f"(primitive, repo frames): {eager_recorder.violations[:20]}"
    )


def test_dryrun_multichip_under_spoofed_tpu_default(monkeypatch):
    """THE r03 regression test (moved from test_platform_dispatch so the
    two dryrun(4)-shaped tests share one module's compiled programs): the
    full driver artifact must survive a TPU-default process + CPU mesh.
    Before the round-4 fix this crashed in sim3_ransac's Pallas consensus
    kernel at lowering."""
    from gps_optimize_slam_tpu.utils import backend

    monkeypatch.setattr(backend, "effective_platform", lambda: "tpu")
    __graft_entry__.dryrun_multichip(4)


def test_seqpar_padding_hermetic(eager_recorder):
    """Direct unit form of the r04 leak: fuse_ekf_rts_seqparallel's padding
    path (n not a mesh multiple → arange/full/zeros tails) must not
    dispatch on the default backend even when called with host NumPy."""
    from gps_optimize_slam_tpu.parallel import seqpar

    mesh = pmesh.make_mesh(n_devices=4)
    n = 4 * 16 + 3  # forces the padding branch
    t = np.arange(n, dtype=np.float32) * 0.1
    pos = np.cumsum(np.ones((n, 3), np.float32) * 0.1, axis=0)
    quat = np.tile(np.asarray([0, 0, 0, 1], np.float32), (n, 1))
    gps = pos + 0.05
    valid = np.ones(n, bool)
    seq_p, seq_q = seqpar.fuse_ekf_rts_seqparallel(
        mesh, t, pos, quat, pos, quat, gps, valid
    )
    np.asarray(seq_p)
    assert eager_recorder.calls > 0
    assert not eager_recorder.violations, (
        f"seqpar staging leaked to the default backend: "
        f"{eager_recorder.violations[:20]}"
    )
