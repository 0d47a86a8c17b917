"""IO tests: native C++ tensor store, checkpoint round trips, engine resume.

The native store is exercised directly (build + write + read + CRC) and the
checkpoint layer both through it and through the numpy fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tame.io import load_checkpoint, save_checkpoint
from tame.io import native


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="no C++ toolchain")


@requires_native
class TestNativeStore:
    def test_roundtrip_dtypes(self, tmp_path):
        rng = np.random.default_rng(0)
        for dtype in ("float32", "float64", "int32", "int64", "uint8"):
            arr = (rng.normal(size=(7, 5)) * 100).astype(dtype)
            path = tmp_path / f"t_{dtype}.tame"
            native.write_tensor(path, arr)
            out = native.read_tensor(path)
            assert out.dtype == arr.dtype
            assert np.array_equal(out, arr)

    def test_roundtrip_shapes(self, tmp_path):
        rng = np.random.default_rng(1)
        for shape in [(), (3,), (2, 3, 4, 5)]:
            arr = rng.normal(size=shape).astype(np.float32)
            path = tmp_path / "t.tame"
            native.write_tensor(path, arr)
            out = native.read_tensor(path)
            assert out.shape == arr.shape
            assert np.allclose(out, arr)

    def test_corruption_detected(self, tmp_path):
        arr = np.arange(100, dtype=np.float32)
        path = tmp_path / "t.tame"
        native.write_tensor(path, arr)
        raw = bytearray(path.read_bytes())
        raw[-5] ^= 0xFF  # flip a payload byte
        path.write_bytes(bytes(raw))
        with pytest.raises(IOError, match="CRC"):
            native.read_tensor(path)

    def test_bad_magic_rejected(self, tmp_path):
        path = tmp_path / "bogus.tame"
        path.write_bytes(b"NOPE" + b"\x00" * 64)
        with pytest.raises(IOError):
            native.read_tensor(path)

    def test_crc32_known_value(self):
        # CRC32 of b"123456789" is the classic check value 0xCBF43926.
        arr = np.frombuffer(b"123456789", dtype=np.uint8)
        assert native.crc32(arr) == 0xCBF43926


class TestCheckpoint:
    def test_roundtrip_nested(self, tmp_path):
        state = {
            "X_mean": np.random.default_rng(0).normal(
                size=(4, 3, 6)).astype(np.float32),
            "nested": {"a": np.arange(5), "note": "hello"},
            "iteration": 17,
        }
        ckpt = tmp_path / "ckpt"
        save_checkpoint(ckpt, state)
        loaded = load_checkpoint(ckpt)
        assert np.allclose(loaded["X_mean"], state["X_mean"])
        assert np.array_equal(loaded["nested"]["a"], state["nested"]["a"])
        assert loaded["nested"]["note"] == "hello"
        assert loaded["iteration"] == 17

    def test_overwrite_atomic(self, tmp_path):
        ckpt = tmp_path / "ckpt"
        save_checkpoint(ckpt, {"x": np.zeros(3)})
        save_checkpoint(ckpt, {"x": np.ones(3)})
        assert np.allclose(load_checkpoint(ckpt)["x"], 1.0)
        assert not (tmp_path / "ckpt.tmp").exists()

    def test_npy_fallback(self, tmp_path, monkeypatch):
        monkeypatch.setattr(native, "available", lambda: False)
        ckpt = tmp_path / "ckpt"
        save_checkpoint(ckpt, {"x": np.arange(4.0)})
        assert list(ckpt.glob("*.npy"))
        assert np.allclose(load_checkpoint(ckpt)["x"], np.arange(4.0))


class TestAsyncCheckpointer:
    def test_overlapped_writes_roundtrip(self, tmp_path):
        from tame.io.async_ckpt import AsyncCheckpointer

        ckptr = AsyncCheckpointer()
        for i in range(3):
            ckptr.save(tmp_path / "ck",
                       {"x": np.full(8, float(i)), "step": i})
        ckptr.wait()
        loaded = load_checkpoint(tmp_path / "ck")
        assert np.allclose(loaded["x"], 2.0)
        assert loaded["step"] == 2

    def test_write_error_surfaces(self, tmp_path):
        from tame.io.async_ckpt import AsyncCheckpointer

        blocker = tmp_path / "blocked"
        blocker.write_text("not a directory")
        ckptr = AsyncCheckpointer()
        # writing "inside" a file must fail in the background thread...
        ckptr.save(blocker / "ck", {"x": np.zeros(2)})
        with pytest.raises(Exception):
            ckptr.wait()
        # ...and the checkpointer stays usable afterwards
        ckptr.save(tmp_path / "ok", {"x": np.ones(2)})
        ckptr.wait()
        assert np.allclose(load_checkpoint(tmp_path / "ok")["x"], 1.0)


class TestEngineResume:
    def test_fit_resume_continues(self, temporal_data, tmp_path):
        from tame.inference import TemporalAMEStructuredMFVI

        vi = TemporalAMEStructuredMFVI(temporal_data["model"],
                                       factorization="good",
                                       learning_rate=0.7)
        vi.fit(max_iter=5, verbose=False)
        vi.save_checkpoint(tmp_path / "ckpt")

        vi2 = TemporalAMEStructuredMFVI(temporal_data["model"],
                                        factorization="good",
                                        learning_rate=0.7)
        vi2.load_checkpoint(tmp_path / "ckpt")
        assert np.allclose(np.asarray(vi2.X_mean), np.asarray(vi.X_mean))
        assert vi2.history["elbo"] == vi.history["elbo"]

        # resumed fit continues improving from the restored state
        vi2.fit(max_iter=5, verbose=False)
        assert len(vi2.history["elbo"]) == 10
        assert vi2.history["elbo"][-1] >= vi2.history["elbo"][4] - 1.0

    def test_segmented_fit_bitwise_equals_single_shot(self, temporal_data,
                                                      tmp_path):
        """In-fit periodic checkpointing must not perturb the fit: a
        checkpoint_every=7 run is bitwise identical (state, history,
        stopping iteration) to one uninterrupted call."""
        from tame.inference import TemporalAMEStructuredMFVI

        ref = TemporalAMEStructuredMFVI(temporal_data["model"],
                                        factorization="good",
                                        learning_rate=0.7)
        ref.fit(max_iter=40, tolerance=1e-3, verbose=False)

        seg = TemporalAMEStructuredMFVI(temporal_data["model"],
                                        factorization="good",
                                        learning_rate=0.7)
        seg.fit(max_iter=40, tolerance=1e-3, verbose=False,
                checkpoint_every=7, ckpt_dir=tmp_path / "seg")
        assert (tmp_path / "seg").exists()

        assert len(seg.history["elbo"]) == len(ref.history["elbo"])
        assert seg.history["elbo"] == ref.history["elbo"]
        assert np.array_equal(np.asarray(seg.X_mean),
                              np.asarray(ref.X_mean))
        assert np.array_equal(np.asarray(seg.X_cov),
                              np.asarray(ref.X_cov))
        assert seg._converged == ref._converged

    def test_kill_and_resume_bitwise(self, temporal_data, tmp_path):
        """A fit killed mid-way and resumed from its checkpoint reproduces
        the uninterrupted fit bitwise (total budget semantics)."""
        from tame.inference import TemporalAMEStructuredMFVI

        ref = TemporalAMEStructuredMFVI(temporal_data["model"],
                                        factorization="good",
                                        learning_rate=0.7)
        ref.fit(max_iter=20, tolerance=0.0, verbose=False)

        # "killed" after 10 iterations (2 checkpointed segments of 5)
        a = TemporalAMEStructuredMFVI(temporal_data["model"],
                                      factorization="good",
                                      learning_rate=0.7)
        a.fit(max_iter=10, tolerance=0.0, verbose=False,
              checkpoint_every=5, ckpt_dir=tmp_path / "ck")

        # fresh process: new engine, resume from the checkpoint
        b = TemporalAMEStructuredMFVI(temporal_data["model"],
                                      factorization="good",
                                      learning_rate=0.7)
        b.fit(max_iter=20, tolerance=0.0, verbose=False,
              checkpoint_every=5, ckpt_dir=tmp_path / "ck", resume=True)

        assert len(b.history["elbo"]) == 20
        assert b.history["elbo"] == ref.history["elbo"]
        assert np.array_equal(np.asarray(b.X_mean), np.asarray(ref.X_mean))

        # a no-op resume (budget already spent) leaves everything alone
        c = TemporalAMEStructuredMFVI(temporal_data["model"],
                                      factorization="good",
                                      learning_rate=0.7)
        c.fit(max_iter=20, tolerance=0.0, verbose=False,
              ckpt_dir=tmp_path / "ck", resume=True)
        assert c.history["elbo"] == ref.history["elbo"]

    def test_resume_after_converged_is_a_noop(self, temporal_data,
                                              tmp_path):
        """A checkpoint taken after the stopping rule fired must not
        re-enter the loop on resume with budget remaining: the
        uninterrupted fit would have stopped there, and resume promises
        bitwise reproduction of it."""
        from tame.inference import TemporalAMEStructuredMFVI

        a = TemporalAMEStructuredMFVI(temporal_data["model"],
                                      factorization="good",
                                      learning_rate=0.7)
        a.fit(max_iter=60, tolerance=1e-2, verbose=False,
              checkpoint_every=5, ckpt_dir=tmp_path / "cv")
        assert a._converged
        n_done = len(a.history["elbo"])
        assert n_done < 60  # converged before the budget

        b = TemporalAMEStructuredMFVI(temporal_data["model"],
                                      factorization="good",
                                      learning_rate=0.7)
        b.fit(max_iter=60, tolerance=1e-2, verbose=False,
              checkpoint_every=5, ckpt_dir=tmp_path / "cv", resume=True)
        assert b._converged
        assert len(b.history["elbo"]) == n_done
        assert b.history["elbo"] == a.history["elbo"]
        assert np.array_equal(np.asarray(b.X_mean), np.asarray(a.X_mean))

    def test_segmented_smoothed_checkpoint(self, temporal_data, tmp_path):
        """The smoothed engine checkpoints and restores its full state
        (means, marginal + cross covariances, logdets)."""
        from tame.inference import TemporalAMESmoothedVI

        vi = TemporalAMESmoothedVI(temporal_data["model"],
                                   learning_rate=0.8)
        vi.fit(max_iter=5, verbose=False)
        vi.save_checkpoint(tmp_path / "sm")

        vi2 = TemporalAMESmoothedVI(temporal_data["model"],
                                    learning_rate=0.8)
        vi2.load_checkpoint(tmp_path / "sm")
        assert np.allclose(np.asarray(vi2.X_mean), np.asarray(vi.X_mean))
        assert np.allclose(np.asarray(vi2.X_cross),
                           np.asarray(vi.X_cross))
        assert vi2.history["elbo"] == vi.history["elbo"]
        vi2.fit(max_iter=3, verbose=False)
        assert len(vi2.history["elbo"]) == 8

    def test_structure_mismatch_rejected(self, temporal_data, tmp_path):
        from tame.inference import (
            TemporalAMENaiveMFVI,
            TemporalAMEStructuredMFVI,
        )

        vi = TemporalAMEStructuredMFVI(temporal_data["model"],
                                       factorization="good")
        vi.save_checkpoint(tmp_path / "ckpt")
        vi2 = TemporalAMENaiveMFVI(temporal_data["model"])
        with pytest.raises(ValueError, match="structure"):
            vi2.load_checkpoint(tmp_path / "ckpt")


class TestOrbax:
    def test_orbax_roundtrip(self, tmp_path):
        import numpy as np

        from tame.io import load_orbax, save_orbax

        state = {"X_mean": np.arange(12.0).reshape(3, 4),
                 "step": np.asarray(5)}
        save_orbax(tmp_path / "ock", state)
        loaded = load_orbax(tmp_path / "ock")
        assert np.allclose(loaded["X_mean"], state["X_mean"])
        assert int(loaded["step"]) == 5


class TestEdgelist:
    """Real-data ingestion: directed panel records <-> (Y, mask) tensors
    (the reference has no data loader of any kind — synthetic only)."""

    def test_roundtrip_through_model_layout(self):
        from tame.io import edgelist_to_tensors, tensors_to_edgelist
        from tame.models import TemporalAMEModel, random_dyad_mask

        model = TemporalAMEModel(n_nodes=8, n_time=4, latent_dim=1, seed=2)
        Y_true, _ = model.generate_data(return_latents=True)
        Y_true = np.asarray(Y_true)
        mask = np.asarray(random_dyad_mask(jax.random.PRNGKey(0), 8, 4,
                                           0.4))
        i, j, t, v = tensors_to_edgelist(Y_true, mask)
        Y, m, info = edgelist_to_tensors(i, j, t, v, n_nodes=8, n_time=4,
                                         node_ids=list(range(8)))
        assert np.array_equal(m, mask)
        assert info["n_dropped_oneway"] == 0
        # observed entries reproduce Y exactly, incl. the reciprocal slot
        obs = mask > 0
        assert np.allclose(Y[obs], Y_true[obs])
        assert np.allclose(Y[..., 1], np.swapaxes(Y[..., 0], 0, 1))
        # unobserved entries zeroed
        assert np.all(Y[~obs] == 0)

    def test_oneway_records_dropped(self):
        from tame.io import edgelist_to_tensors

        Y, m, info = edgelist_to_tensors(
            ["a", "b", "a"], ["b", "a", "c"], [0, 0, 0], [1.0, 2.0, 3.0],
            n_time=1)
        # a<->b observed both ways; a->c lacks its reverse
        assert info["n_dropped_oneway"] == 1
        assert m.sum() == 2  # (a,b) and (b,a)
        assert Y[0, 1, 0, 0] == 1.0 and Y[0, 1, 0, 1] == 2.0
        assert m[0, 2, 0] == 0 and Y[0, 2, 0, 0] == 0

    def test_self_loop_rejected(self):
        from tame.io import edgelist_to_tensors

        with pytest.raises(ValueError, match="self-loops"):
            edgelist_to_tensors(["a"], ["a"], [0], [1.0])

    @pytest.mark.slow
    def test_masked_fit_from_edgelist(self):
        """End-to-end: records -> tensors -> masked fit converges."""
        from tame.inference import cavi
        from tame.io import edgelist_to_tensors, tensors_to_edgelist
        from tame.models import TemporalAMEModel, random_dyad_mask

        model = TemporalAMEModel(n_nodes=10, n_time=4, latent_dim=1,
                                 seed=5)
        Y_true, _ = model.generate_data(return_latents=True)
        mask = np.asarray(random_dyad_mask(jax.random.PRNGKey(1), 10, 4,
                                           0.25))
        i, j, t, v = tensors_to_edgelist(np.asarray(Y_true), mask)
        Y, m, _ = edgelist_to_tensors(i, j, t, v, n_nodes=10, n_time=4,
                                      node_ids=list(range(10)))
        init = cavi.init_state(jax.random.PRNGKey(2), 10, 4, 4, "full",
                               0.1, 0.5)
        out = cavi.fit_cavi(jnp.asarray(Y), model.params, init,
                            structure="full", update_mode="jacobi",
                            mask=jnp.asarray(m), max_iter=50,
                            learning_rate=0.7, tolerance=0.0)
        eh = np.asarray(out.elbo_history)[:50]
        assert np.all(np.isfinite(eh)) and eh[-1] > eh[0]


class TestKarateClub:
    """The bundled REAL dataset (Zachary 1977 via networkx; see
    tame/io/datasets.py) driven through the full real-data pipeline —
    the CI-run version of the cookbook's "Real data" recipe.  Every
    asserted number is a measured real-data result, not synthetic."""

    @pytest.fixture(scope="class")
    def karate_fit(self):
        from tame.config import ModelConfig
        from tame.inference import TemporalAMEPoissonVI
        from tame.io import load_karate_club
        from tame.models import build_params, random_dyad_mask

        data = load_karate_club()
        n = data.n_nodes
        hide = np.asarray(random_dyad_mask(jax.random.PRNGKey(1), n, 1,
                                           0.2))
        off = 1.0 - np.eye(n)[:, :, None]
        fitmask = off * hide
        held = off * (1.0 - hide)

        class _Data:
            pass

        m = _Data()
        m.Y = data.Y
        m.params = build_params(ModelConfig(n_nodes=n, n_time=1,
                                            latent_dim=2, seed=0))
        m.n, m.T, m.d, m.r = n, 1, 6, 2
        vi = TemporalAMEPoissonVI(m, mask=jnp.asarray(fitmask),
                                  init_mode="warm")
        vi.fit(max_iter=300, tolerance=1e-6, verbose=False)
        return data, vi, fitmask, held

    @staticmethod
    def _auc(scores, labels):
        pos, neg = scores[labels > 0.5], scores[labels < 0.5]
        return float(np.mean([(p > q) + 0.5 * (p == q)
                              for p in pos for q in neg]))

    def test_load(self):
        from tame.io import load_karate_club

        data = load_karate_club()
        assert data.Y.shape == (34, 34, 1, 2)
        # reciprocal layout + symmetry of the real counts
        assert np.array_equal(data.Y[..., 1],
                              np.swapaxes(data.Y[..., 0], 0, 1))
        assert data.Y.max() == 7.0          # Zachary's max context count
        assert (data.Y[..., 0] > 0).sum() == 156  # 78 undirected edges
        assert data.factions.sum() == 17    # the split was 17 / 17

    def test_holdout_link_prediction_beats_degree_baseline(self,
                                                           karate_fit):
        data, vi, fitmask, held = karate_fit
        y0 = data.Y[..., 0]
        sel = held > 0
        lbl = (y0[sel] > 0).astype(float)
        rate = np.asarray(vi.predict_rate())
        auc_model = self._auc(rate[sel], lbl)
        deg_out = (y0 * fitmask).sum(axis=(1, 2))
        deg_in = (y0 * fitmask).sum(axis=(0, 2))
        base = np.broadcast_to(
            (deg_out[:, None] + deg_in[None, :])[:, :, None], y0.shape)
        auc_base = self._auc(base[sel], lbl)
        # measured: 0.789 vs 0.754
        assert auc_model > 0.75, auc_model
        assert auc_model > auc_base, (auc_model, auc_base)

    def test_holdout_deviance_beats_intercept_only(self, karate_fit):
        data, vi, fitmask, held = karate_fit
        y0 = data.Y[..., 0]
        sel = held > 0
        rate = np.asarray(vi.predict_rate())[sel]

        def mean_dev(rates):
            with np.errstate(divide="ignore", invalid="ignore"):
                ylogy = np.where(
                    y0[sel] > 0,
                    y0[sel] * (np.log(np.maximum(y0[sel], 1e-12))
                               - np.log(rates)), 0.0)
            return float(np.mean(2 * (ylogy - (y0[sel] - rates))))

        base = (y0 * fitmask).sum() / fitmask.sum()
        # measured: 1.12 vs 1.35
        assert mean_dev(rate) < mean_dev(np.full(sel.sum(), base))

    def test_latents_recover_real_factions(self, karate_fit):
        """The substantive check: the fitted multiplicative effects must
        separate the OBSERVED post-fission factions (external ground
        truth, not part of the fit).  Measured: 94% accuracy."""
        data, vi, fitmask, held = karate_fit
        U = np.asarray(vi.X_mean)[:, 0, 2:]
        Uc = U - U.mean(0)
        _, _, Vt = np.linalg.svd(Uc, full_matrices=False)
        proj = Uc @ Vt[0]
        pred = proj > np.median(proj)
        acc = max((pred == data.factions).mean(),
                  (pred != data.factions).mean())
        assert acc > 0.85, acc
