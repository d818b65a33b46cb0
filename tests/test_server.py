"""Web-server tests: the reference's route surface (GET /, GET /config,
POST /generate, static /web_generated — run/server.py:194-205) against a
warm in-process tiny model."""

import json
import os

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import AioHTTPTestCase  # noqa: E402

import jax  # noqa: E402

LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"


@pytest.fixture(scope="module")
def tiny_server_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("server")
    raw_cfg = {
        "dataset": {"preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                       "num_mels": 16, "trim": False, "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "srv",
                     "args": {"max_steps": 10}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": {"speaker_tokens": {"active": False}, "controls": {"active": False}},
    }
    cfg_path = str(root / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(raw_cfg, f)

    from tacotron2_tpu.config import config_from_dict
    from run.common import build_model
    from tacotron2_tpu.training.checkpoint import save_checkpoint

    cfg = config_from_dict(raw_cfg)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = str(root / "tiny.ckpt")
    save_checkpoint(ckpt, params, state, raw_cfg)

    server_config = {
        "models": [
            {"name": "tiny", "config": cfg_path, "checkpoint": ckpt,
             "multi_speaker": False, "controllable": False, "num_voices": 1,
             "max_len": 16},
        ]
    }
    return server_config


def test_server_routes(tiny_server_setup, tmp_path, monkeypatch):
    import asyncio

    monkeypatch.chdir(tmp_path)  # web_generated lands in a temp cwd
    asyncio.run(_run_server_checks(tiny_server_setup))


def test_server_subprocess_mode(tiny_server_setup, tmp_path, monkeypatch):
    """Reference-parity serving: POST /generate spawns `python main.py ...
    say ...` in a child process (run/server.py:151-188)."""
    import asyncio
    import shutil

    # the subprocess runs main.py from its cwd — stage a minimal repo view
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(tmp_path)
    (tmp_path / "main.py").symlink_to(os.path.join(repo, "main.py"))
    for pkg in ("tacotron2_tpu", "run", "preprocessing", "web", "native"):
        (tmp_path / pkg).symlink_to(os.path.join(repo, pkg), target_is_directory=True)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    # share the suite's persistent compile cache with the child: the cold
    # say-pipeline compile (~minutes on a saturated 1-core host) becomes a
    # cache reload, taking the flakiness out of the client timeout
    monkeypatch.setenv(
        "TACOTRON2_COMPILE_CACHE",
        os.path.join(repo, "tests", ".jax_cache"),
    )

    async def run():
        from aiohttp import ClientTimeout
        from aiohttp.test_utils import TestClient, TestServer

        from run.server import make_app

        app = make_app(tiny_server_setup, mode="subprocess")
        # the child re-compiles the whole say pipeline; on a saturated
        # 1-core host that can exceed aiohttp's default 5-minute client
        # timeout (observed flaking when the suite runs concurrently with
        # hardware benches)
        async with TestClient(
            TestServer(app), timeout=ClientTimeout(total=1200)
        ) as client:
            resp = await client.post(
                "/generate", json={"text": "subprocess mode", "model": 0, "seed": 1}
            )
            assert resp.status == 200
            body = await resp.json()
            assert os.path.exists(body["path"])
            with open(body["path"], "rb") as f:
                assert f.read(4) == b"RIFF"

    asyncio.run(run())


async def _run_server_checks(server_config):
    from aiohttp.test_utils import TestClient, TestServer

    from run.server import make_app

    app = make_app(server_config, mode="warm")
    async with TestClient(TestServer(app)) as client:
        # UI
        resp = await client.get("/")
        assert resp.status == 200
        assert "Tacotron" in await resp.text()
        # registry
        resp = await client.get("/config")
        models = await resp.json()
        assert models == [
            {"name": "tiny", "multi_speaker": False, "controllable": False, "num_voices": 1}
        ]
        # generation
        resp = await client.post(
            "/generate", json={"text": "hello server", "model": 0, "seed": 3}
        )
        assert resp.status == 200
        body = await resp.json()
        assert body["path"].endswith(".wav")
        assert os.path.exists(body["path"])
        # generated wav served statically
        resp = await client.get("/" + body["path"])
        assert resp.status == 200
        data = await resp.read()
        assert data[:4] == b"RIFF"
        # request metadata dump exists (run/server.py:136-141)
        assert os.path.exists(body["path"].replace(".wav", ".json"))
        # operational telemetry (beyond-reference)
        resp = await client.get("/stats")
        st = await resp.json()
        assert st["requests"]["ok"] == 1 and st["requests"]["failed"] == 0
        assert st["batching"]["decoded_rows"] >= 1
        assert st["models_loaded"] == [0] and st["mesh_devices"] == 1
        # a validation failure counts as failed
        resp = await client.post("/generate", json={"text": "x", "model": 9})
        assert resp.status == 400
        st = await (await client.get("/stats")).json()
        assert st["requests"]["failed"] == 1
        # malformed numeric fields are the CLIENT's error: 400 with a
        # reason, not an opaque 500 traceback page
        resp = await client.post(
            "/generate", json={"text": "x", "model": 0, "seed": "abc"}
        )
        assert resp.status == 400
        assert "seed" in (await resp.json())["error"]
        resp = await client.post(
            "/generate", json={"text": "x", "model": 0, "voice": "loud"}
        )
        assert resp.status == 400


def test_validate_request_coerces_and_rejects_controls():
    """_validate_request coerces controls entries to floats (a non-numeric
    entry must 400 THIS request, not blow up np.asarray inside the batched
    synthesis and 500 every co-batched request) and rejects malformed
    shapes/types with ValueError (mapped to HTTP 400)."""
    from types import SimpleNamespace

    from run.server import _validate_request

    cfg = SimpleNamespace(
        controls_dim=2,
        extensions=SimpleNamespace(
            speaker_tokens=SimpleNamespace(active=False, num_speakers=1)
        ),
    )
    req = {"controls": ["0.5", 1]}
    _validate_request(cfg, req)
    assert req["controls"] == [0.5, 1.0]  # coerced in place for the batch
    for bad in (
        {"controls": ["a", "b"]},  # non-numeric entries
        {"controls": 3},           # not a list
        {"controls": [1.0]},       # wrong dim
        {},                        # missing while controls active
    ):
        with pytest.raises(ValueError):
            _validate_request(cfg, dict(bad))


def test_server_warm_fused_int8_packs_once(tiny_server_setup, tmp_path, monkeypatch):
    """Opt-in quantize_int8 registry flag: the decoder is packed/quantized
    ONCE at load time; subsequent /generate requests do ZERO re-packing
    (VERDICT r1 missing #4). Asserted via the pack-call counter."""
    import asyncio
    import copy

    monkeypatch.chdir(tmp_path)
    server_config = copy.deepcopy(tiny_server_setup)
    server_config["models"][0]["quantize_int8"] = True

    async def run():
        from aiohttp.test_utils import TestClient, TestServer

        from run.server import make_app
        from tacotron2_tpu.ops import decoder_loop_pallas as dlp

        app = make_app(server_config, mode="warm")
        async with TestClient(TestServer(app)) as client:
            base = dlp.PACK_CALLS[0]
            r1 = await client.post(
                "/generate", json={"text": "first request", "model": 0, "seed": 5}
            )
            assert r1.status == 200
            after_first = dlp.PACK_CALLS[0]
            assert after_first == base + 1  # packed exactly once, at load
            r2 = await client.post(
                "/generate", json={"text": "second one", "model": 0, "seed": 6}
            )
            assert r2.status == 200
            assert dlp.PACK_CALLS[0] == after_first  # zero re-packing
            body = await r2.json()
            assert os.path.exists(body["path"])
            with open(body["path"], "rb") as f:
                assert f.read(4) == b"RIFF"

    asyncio.run(run())


def test_server_dynamic_batching(tiny_server_setup, tmp_path, monkeypatch):
    """Warm-mode dynamic batching: concurrent /generate requests coalesce
    into ONE decode launch (BATCH_CALLS telemetry), and each request's wav
    matches what the same request produces alone — per-row PRNG streams
    make audio independent of batch composition (fp-noise tolerance; the
    kernel-level contract is test_fused_decoder.py::
    test_row_rngs_batch_invariant)."""
    import asyncio
    import copy

    monkeypatch.chdir(tmp_path)
    server_config = copy.deepcopy(tiny_server_setup)
    # generous window so the gathered posts reliably land in one batch on
    # a loaded CI host; singles afterwards still run alone (queue empty)
    server_config["batching"] = {"window_ms": 500, "max_batch": 8}

    async def run():
        from aiohttp import ClientTimeout
        from aiohttp.test_utils import TestClient, TestServer

        from run import server as srv
        from tacotron2_tpu.audio.io import read_wav

        app = srv.make_app(server_config, mode="warm")
        async with TestClient(
            TestServer(app), timeout=ClientTimeout(total=1200)
        ) as client:
            # warm: load the model + compile the batch-of-1 program
            r = await client.post(
                "/generate", json={"text": "warm up", "model": 0, "seed": 1}
            )
            assert r.status == 200

            texts = [("first request here", 5), ("a second one", 6),
                     ("and the third", 7)]
            calls0, rows0 = srv.BATCH_CALLS
            rs = await asyncio.gather(*[
                client.post("/generate",
                            json={"text": t, "model": 0, "seed": s})
                for t, s in texts
            ])
            batched_paths = []
            for r in rs:
                assert r.status == 200
                batched_paths.append((await r.json())["path"])
            assert srv.BATCH_CALLS[1] - rows0 == 3
            assert srv.BATCH_CALLS[0] - calls0 == 1, "requests did not coalesce"

            # same requests, each alone -> audio unchanged
            for (t, s), bp in zip(texts, batched_paths):
                r = await client.post(
                    "/generate", json={"text": t, "model": 0, "seed": s}
                )
                sp = (await r.json())["path"]
                wav_b, _ = read_wav(bp)
                wav_s, _ = read_wav(sp)
                assert wav_b.shape == wav_s.shape
                np.testing.assert_allclose(wav_b, wav_s, atol=1e-3, rtol=0)

    asyncio.run(run())


def test_server_batched_vocoder(tmp_path, monkeypatch):
    """Warm server with a HiFi-GAN entry: the micro-batch vocodes as ONE
    batched call (mel padded to a shared 128-frame bucket, wav cut back to
    cut*hop per row) and still yields RIFF wavs per request."""
    import asyncio
    import sys

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from model.hifi_gan import Generator as TorchGenerator

    h = {"resblock": "1", "upsample_rates": [8, 2], "upsample_kernel_sizes": [16, 4],
         "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
         "resblock_dilation_sizes": [[1, 3, 5]], "num_mels": 16}

    class AttrDict(dict):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.__dict__ = self

    torch.manual_seed(0)
    gen = TorchGenerator(AttrDict(dict(h, num_mels=80)))
    gen.conv_pre = torch.nn.utils.weight_norm(torch.nn.Conv1d(16, 16, 7, 1, padding=3))
    hdir = tmp_path / "hifi"
    hdir.mkdir()
    torch.save({"generator": gen.state_dict()}, str(hdir / "g_00000001"))
    with open(hdir / "config.json", "w") as f:
        json.dump(h, f)

    from run.common import build_model
    from tacotron2_tpu.config import config_from_dict
    from tacotron2_tpu.training.checkpoint import save_checkpoint

    raw_cfg = {
        "dataset": {"preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                       "num_mels": 16, "trim": False, "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "srv-voc",
                     "args": {"max_steps": 1}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": {"speaker_tokens": {"active": False}, "controls": {"active": False}},
    }
    cfg = config_from_dict(raw_cfg)
    import jax as _jax

    model = build_model(cfg)
    params, state = model.init(_jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params, state, raw_cfg)
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(raw_cfg, f)

    server_config = {
        "models": [{"name": "voc", "config": cfg_path, "checkpoint": ckpt,
                    "hifi_gan_checkpoint": str(hdir / "g_00000001"),
                    "max_len": 12}],
        "batching": {"window_ms": 400, "max_batch": 4},
        "warmup": True,
    }
    monkeypatch.chdir(tmp_path)

    async def run():
        from aiohttp import ClientTimeout
        from aiohttp.test_utils import TestClient, TestServer

        from run import server as srv

        calls_pre = srv.BATCH_CALLS[0]
        app = srv.make_app(server_config, mode="warm")
        # "warmup": true primed the model at startup (one synth through
        # the full serving path — decode + vocoder programs compiled
        # before the first request)
        assert srv.BATCH_CALLS[0] == calls_pre + 1
        async with TestClient(
            TestServer(app), timeout=ClientTimeout(total=1200)
        ) as client:
            r = await client.post(
                "/generate", json={"text": "warm", "model": 0, "seed": 1}
            )
            assert r.status == 200
            calls0 = srv.BATCH_CALLS[0]
            rs = await asyncio.gather(*[
                client.post("/generate",
                            json={"text": t, "model": 0, "seed": i})
                for i, t in enumerate(["one request", "two requests"])
            ])
            for r in rs:
                assert r.status == 200
                body = await r.json()
                with open(body["path"], "rb") as f:
                    assert f.read(4) == b"RIFF"
            assert srv.BATCH_CALLS[0] - calls0 == 1

    asyncio.run(run())


def test_server_worker_survives_bad_model_and_validates_controls(
        tiny_server_setup, tmp_path, monkeypatch):
    """Two review-pinned behaviors: (1) a model entry whose checkpoint
    path is broken fails THAT request with HTTP 500 — it must not kill
    the micro-batch worker task and hang every later request for the
    model; (2) on a controls-disabled model, a request that passes a
    controls vector is rejected per-request with HTTP 400 (the solo path
    raised already; co-batching must not change a request's
    semantics)."""
    import asyncio
    import copy

    monkeypatch.chdir(tmp_path)
    server_config = copy.deepcopy(tiny_server_setup)
    server_config["models"].append({
        "name": "broken", "config": server_config["models"][0]["config"],
        "checkpoint": str(tmp_path / "nope.ckpt"),
        "multi_speaker": False, "controllable": False, "num_voices": 1,
    })

    async def run():
        from aiohttp import ClientTimeout
        from aiohttp.test_utils import TestClient, TestServer

        from run import server as srv

        app = srv.make_app(server_config, mode="warm")
        async with TestClient(
            TestServer(app), timeout=ClientTimeout(total=1200)
        ) as client:
            # (1) broken model: every request errors, none hangs
            for _ in range(2):
                r = await client.post(
                    "/generate", json={"text": "x", "model": 1, "seed": 1}
                )
                assert r.status == 500
            # (2) controls on a controls-disabled model: rejected, while
            # a clean request sharing the server still succeeds
            r_bad, r_good = await asyncio.gather(
                client.post("/generate", json={
                    "text": "bad", "model": 0, "seed": 2,
                    "controls": [0.5, -0.5]}),
                client.post("/generate", json={
                    "text": "good", "model": 0, "seed": 3}),
            )
            assert r_bad.status == 400  # client error, with the reason
            assert "controls" in (await r_bad.json())["error"]
            assert r_good.status == 200
            body = await r_good.json()
            assert os.path.exists(body["path"])

    asyncio.run(run())


def test_server_text_reaches_synthesis_unescaped(tiny_server_setup, tmp_path,
                                                 monkeypatch):
    """Regression: the spoken text must reach synthesis VERBATIM. The
    reference's `\\`/`!`/`'` translation (run/server.py:139-147) is shell
    -metachar protection for its subprocess shell string — we exec
    argv-style and synthesize in-process, so any escaping layer corrupts
    the audio (an earlier html.escape turned "don't" into "don&#x27;t",
    which normalize_text's char filter then spoke as "donx27t")."""
    import asyncio

    monkeypatch.chdir(tmp_path)
    raw = "don't stop! it's O'Neill's."
    captured = []

    async def run():
        from aiohttp.test_utils import TestClient, TestServer

        from run import server as srv

        real = srv._synthesize_batch

        def spy(bundle, reqs):
            captured.extend(r["text"] for r in reqs)
            return real(bundle, reqs)

        monkeypatch.setattr(srv, "_synthesize_batch", spy)
        app = srv.make_app(tiny_server_setup, mode="warm")
        async with TestClient(TestServer(app)) as client:
            resp = await client.post(
                "/generate", json={"text": raw, "model": 0, "seed": 2}
            )
            assert resp.status == 200
            body = await resp.json()
            # metadata dump keeps the raw request text too
            with open(body["path"].replace(".wav", ".json")) as f:
                assert json.load(f)["text"] == raw
            # out-of-range model index is request validation -> 400
            bad = await client.post(
                "/generate", json={"text": "x", "model": 9, "seed": 1}
            )
            assert bad.status == 400
            assert "model index" in (await bad.json())["error"]
            # so is a non-integer model field (and null coerces to 0)
            bad = await client.post(
                "/generate", json={"text": "x", "model": "nope"}
            )
            assert bad.status == 400
            assert "integer" in (await bad.json())["error"]
            ok = await client.post(
                "/generate", json={"text": "null model", "model": None,
                                   "seed": 4}
            )
            assert ok.status == 200

    asyncio.run(run())
    assert captured == [raw, "null model"]


def test_server_mesh_sharded_decode(tiny_server_setup, tmp_path, monkeypatch):
    """Multi-chip serving (server config mesh {"data": N}): concurrent
    requests coalesce into ONE decode whose batch is row-sharded across
    the mesh (bucket rounds up to a multiple of N), and each request's
    audio still matches its own solo run — sharding, like batching, is
    pure throughput. Runs on the suite's virtual 8-CPU-device backend."""
    import asyncio
    import copy

    import jax

    assert len(jax.devices()) >= 2  # conftest forces 8 virtual devices

    monkeypatch.chdir(tmp_path)
    server_config = copy.deepcopy(tiny_server_setup)
    server_config["batching"] = {"window_ms": 500, "max_batch": 8}
    server_config["mesh"] = {"data": 2}

    async def run():
        from aiohttp import ClientTimeout
        from aiohttp.test_utils import TestClient, TestServer

        from run import server as srv
        from tacotron2_tpu.audio.io import read_wav

        app = srv.make_app(server_config, mode="warm")
        async with TestClient(
            TestServer(app), timeout=ClientTimeout(total=1200)
        ) as client:
            r = await client.post(
                "/generate", json={"text": "warm up", "model": 0, "seed": 1}
            )
            assert r.status == 200, await r.text()

            texts = [("shard the first", 5), ("and the second", 6),
                     ("plus a third", 7)]
            calls0 = srv.BATCH_CALLS[0]
            rs = await asyncio.gather(*[
                client.post("/generate",
                            json={"text": t, "model": 0, "seed": s})
                for t, s in texts
            ])
            batched_paths = []
            for r in rs:
                assert r.status == 200, await r.text()
                batched_paths.append((await r.json())["path"])
            assert srv.BATCH_CALLS[0] - calls0 == 1, "did not coalesce"

            for (t, s), bp in zip(texts, batched_paths):
                r = await client.post(
                    "/generate", json={"text": t, "model": 0, "seed": s}
                )
                sp = (await r.json())["path"]
                wav_b, _ = read_wav(bp)
                wav_s, _ = read_wav(sp)
                assert wav_b.shape == wav_s.shape
                np.testing.assert_allclose(wav_b, wav_s, atol=1e-3, rtol=0)

    asyncio.run(run())


def test_server_reference_client_schema(tmp_path, monkeypatch):
    """A stock reference client works unchanged: the reference UI posts
    {model, text, random_seed, speaker, vocoder, <one named field per
    control slider>} (web/index.html:190-201) and reads `filename` from
    the response (run/server.py:188). Our /generate accepts those as
    aliases — the named slider fields map through the server config's
    `controls` list of {"val": name} descriptors — and must produce the
    same audio as the equivalent framework-schema request."""
    import asyncio

    monkeypatch.chdir(tmp_path)

    from run.common import build_model
    from tacotron2_tpu.config import config_from_dict
    from tacotron2_tpu.training.checkpoint import save_checkpoint

    raw_cfg = {
        "dataset": {"preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                       "num_mels": 16, "trim": False, "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "srv-ref",
                     "args": {"max_steps": 1}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": {
            "speaker_tokens": {"active": True, "num_speakers": 2},
            "controls": {"active": True,
                          "features": ["pitch_speaker_norm_clip",
                                       "rate_speaker_norm_clip"]},
        },
    }
    cfg = config_from_dict(raw_cfg)
    import jax as _jax

    model = build_model(cfg)
    params, state = model.init(_jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params, state, raw_cfg)
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(raw_cfg, f)

    server_config = {
        "models": [{"name": "ref", "config": cfg_path, "checkpoint": ckpt,
                    "multi_speaker": True, "controllable": True,
                    "num_voices": 2, "max_len": 12}],
        # reference-style slider descriptors (its _CONFIG["controls"])
        "controls": [{"val": "pitch"}, {"val": "rate"}],
    }

    async def run():
        from aiohttp import ClientTimeout
        from aiohttp.test_utils import TestClient, TestServer

        from run import server as srv
        from tacotron2_tpu.audio.io import read_wav

        app = srv.make_app(server_config, mode="warm")
        async with TestClient(
            TestServer(app), timeout=ClientTimeout(total=1200)
        ) as client:
            ref_style = {"text": "hello there", "model": 0, "speaker": 1,
                         "random_seed": 11, "vocoder": True,
                         "pitch": 0.5, "rate": -0.25}
            our_style = {"text": "hello there", "model": 0, "voice": 1,
                         "seed": 11, "use_vocoder": True,
                         "controls": [0.5, -0.25]}
            r_ref = await client.post("/generate", json=ref_style)
            assert r_ref.status == 200, await r_ref.text()
            body = await r_ref.json()
            assert body["filename"] == "/" + body["path"]
            r_our = await client.post("/generate", json=our_style)
            assert r_our.status == 200, await r_our.text()
            wav_ref = read_wav(body["path"])[0]
            wav_our = read_wav((await r_our.json())["path"])[0]
            np.testing.assert_array_equal(wav_ref, wav_our)

            # a reference client posts the slider fields unconditionally
            # (its UI's output dict always includes them) — they must be
            # IGNORED when the registry entry is non-controllable, not
            # rejected by controls validation
            raw2 = json.loads(json.dumps(raw_cfg))
            raw2["extensions"] = {"speaker_tokens": {"active": False},
                                  "controls": {"active": False}}
            cfg2 = config_from_dict(raw2)
            m2 = build_model(cfg2)
            p2, s2 = m2.init(_jax.random.PRNGKey(1))
            ckpt2 = str(tmp_path / "m2.ckpt")
            save_checkpoint(ckpt2, p2, s2, raw2)
            cfg2_path = str(tmp_path / "config2.json")
            with open(cfg2_path, "w") as f:
                json.dump(raw2, f)
            app3 = srv.make_app({
                "models": [{"name": "plain", "config": cfg2_path,
                            "checkpoint": ckpt2, "multi_speaker": False,
                            "controllable": False, "num_voices": 1,
                            "max_len": 12}],
            }, mode="warm")
            async with TestClient(
                TestServer(app3), timeout=ClientTimeout(total=1200)
            ) as client3:
                r = await client3.post("/generate", json={
                    "text": "plain model", "model": 0, "random_seed": 3,
                    "vocoder": True, "pitch": 0.1, "pitch_range": 0.0,
                    "intensity": 0.0, "nhr": 0.0, "rate": 0.0})
                assert r.status == 200, await r.text()

    asyncio.run(run())


def test_vocode_bucket_invariance_and_rf():
    """The serving path pads each row's mel to a 128-frame bucket sized
    with the generator's mel-domain receptive field: with that margin, a
    row's KEPT samples must be bit-identical whatever bucket the batch
    landed on (no kept sample's RF reaches the SAME-padding boundary).
    Also pins mel_receptive_field on the UNIVERSAL_V1 shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig
    from tacotron2_tpu.models.layers import Policy

    m = HiFiGAN(HiFiGANConfig(
        upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
        upsample_initial_channel=64, num_mels=8),
        Policy.from_string("32-true"))
    p = jax.tree.map(lambda a: a * 3.0, m.init(jax.random.PRNGKey(0)))
    rf = m.mel_receptive_field()
    assert 0 < rf < 128  # sane one-sided reach in mel frames

    cut = 20
    factor = m.cfg.total_upsample
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((cut, 8)).astype(np.float32)
    wavs = []
    for Tb in (-(-(cut + rf) // 128) * 128, 512):  # solo vs co-batched bucket
        padded = np.pad(mel, ((0, Tb - cut), (0, 0)))
        wav = np.asarray(m.apply(p, jnp.asarray(padded[None])))[0]
        wavs.append(wav[: cut * factor])
    np.testing.assert_array_equal(wavs[0], wavs[1])

    # UNIVERSAL_V1 flagship shape: RF is a couple dozen mel frames
    flagship = HiFiGAN(HiFiGANConfig())
    assert 8 <= flagship.mel_receptive_field() <= 64


def test_host_prng_keys_match_jax():
    """run.common.host_prng_keys builds per-request threefry keys on the
    HOST (each jax.random.PRNGKey call is a device dispatch — ~28 ms per
    request through the axon tunnel, ~450 ms of a K=16 batched window).
    Pin bit-equality with jax.random.PRNGKey under the framework default
    (threefry2x32, x64 disabled: jax truncates the seed to its low 32
    bits, zero high word) across the integer edge cases a JSON 'seed'
    field can carry."""
    import jax

    from run.common import host_prng_keys

    seeds = [0, 1, 7, 123456789, 2**31 - 1, 2**32 + 17, 2**63 - 1,
             -1, -(2**31)]
    got = host_prng_keys(seeds)
    assert got.dtype == np.uint32 and got.shape == (len(seeds), 2)
    for s, h in zip(seeds, got):
        np.testing.assert_array_equal(np.asarray(jax.random.PRNGKey(s)), h)


def test_cut_vocoder_matches_host_stack(tmp_path):
    """The device-side vocode epilogue (run.common.jitted_cut_vocoder:
    row gather + per-row cut zeroing + HiFi-GAN + PCM16 quantize in ONE
    jitted launch, so the mel block never round-trips the host and the
    wav crosses the tunnel as int16) is bit-identical to the old host
    flow: fetch mels, np.pad each row to the Tb bucket, stack with
    zero dummy rows, f32 vocode, write_wav's PCM16 clip/scale. Covers
    Tb past the decode buffer (the jnp.pad branch) and the
    power-of-two dummy rows, and pins that write_wav's int16
    passthrough produces the same file bytes as its f32 path."""
    import jax
    import jax.numpy as jnp

    from run.common import jitted_cut_vocoder, jitted_vocoder
    from tacotron2_tpu.audio.io import write_wav
    from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig
    from tacotron2_tpu.models.layers import Policy

    m = HiFiGAN(HiFiGANConfig(
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32, num_mels=8),
        Policy.from_string("32-true"))
    p = m.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    mels = rng.standard_normal((5, 40, 8)).astype(np.float32)  # (B, T', M)
    rows, cuts = [0, 2, 3], {0: 20, 2: 7, 3: 38}

    for Tb in (40, 128):  # slice branch / pad-past-the-buffer branch
        nb = 4  # power-of-two bucket -> one dummy row
        # old host flow
        stack = np.stack([
            np.pad(mels[b, : cuts[b]], ((0, Tb - cuts[b]), (0, 0)))
            for b in rows
        ] + [np.zeros((Tb, 8), np.float32)])
        wav_host = np.asarray(jitted_vocoder(m)(p, stack))
        clipped = np.clip(wav_host, -1.0, 1.0 - 1.0 / 32768.0)
        ref_i16 = (clipped * 32768.0).astype(np.int16)
        # new device flow
        row_idx = jnp.asarray(np.array(rows + [0], np.int32))
        cuts_arr = jnp.asarray(
            np.array([cuts[b] for b in rows] + [0], np.int32))
        got = np.asarray(jitted_cut_vocoder(m)(
            p, jnp.asarray(mels), row_idx, cuts_arr, Tb))
        assert got.dtype == np.int16 and got.shape == (nb, Tb * 8)
        np.testing.assert_array_equal(got, ref_i16)

    # write_wav: int16 passthrough == f32 path, byte for byte
    f_a, f_b = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(f_a, wav_host[0], 22050)
    write_wav(f_b, got[0], 22050)
    with open(f_a, "rb") as fa, open(f_b, "rb") as fb:
        assert fa.read() == fb.read()


def test_server_batched_per_row_conditioning(tmp_path, monkeypatch):
    """Co-batched requests keep THEIR OWN conditioning: speaker_id and
    controls are stacked per row in _synthesize_batch (a regression that
    broadcast row 0's conditioning across the window would pass every
    other server test — seeds are the only per-row signal they pin).
    Three concurrent requests share one decode launch with the SAME seed
    but different (voice, controls); each must (a) differ from the
    others and (b) match its own solo run. HiFi-GAN entry so the wavs
    carry real signal even at the untrained model's 1-frame gate cut."""
    import asyncio
    import sys

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from model.hifi_gan import Generator as TorchGenerator

    h = {"resblock": "1", "upsample_rates": [8, 2], "upsample_kernel_sizes": [16, 4],
         "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
         "resblock_dilation_sizes": [[1, 3, 5]], "num_mels": 16}

    class AttrDict(dict):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.__dict__ = self

    torch.manual_seed(0)
    gen = TorchGenerator(AttrDict(dict(h, num_mels=80)))
    gen.conv_pre = torch.nn.utils.weight_norm(torch.nn.Conv1d(16, 16, 7, 1, padding=3))
    hdir = tmp_path / "hifi"
    hdir.mkdir()
    torch.save({"generator": gen.state_dict()}, str(hdir / "g_00000001"))
    with open(hdir / "config.json", "w") as f:
        json.dump(h, f)

    from run.common import build_model
    from tacotron2_tpu.config import config_from_dict
    from tacotron2_tpu.training.checkpoint import save_checkpoint

    raw_cfg = {
        "dataset": {"preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                       "num_mels": 16, "trim": False, "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "srv-cond",
                     "args": {"max_steps": 1}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": {
            "speaker_tokens": {"active": True, "num_speakers": 2},
            "controls": {"active": True,
                          "features": ["a_speaker_norm_clip", "b_speaker_norm_clip"]},
        },
    }
    cfg = config_from_dict(raw_cfg)
    import jax as _jax

    model = build_model(cfg)
    params, state = model.init(_jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params, state, raw_cfg)
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(raw_cfg, f)

    server_config = {
        "models": [{"name": "cond", "config": cfg_path, "checkpoint": ckpt,
                    "hifi_gan_checkpoint": str(hdir / "g_00000001"),
                    "multi_speaker": True, "controllable": True,
                    "num_voices": 2, "max_len": 12}],
        "batching": {"window_ms": 500, "max_batch": 8},
    }
    monkeypatch.chdir(tmp_path)

    async def run():
        from aiohttp import ClientTimeout
        from aiohttp.test_utils import TestClient, TestServer

        from run import server as srv
        from tacotron2_tpu.audio.io import read_wav

        app = srv.make_app(server_config, mode="warm")
        async with TestClient(
            TestServer(app), timeout=ClientTimeout(total=1200)
        ) as client:
            reqs = [  # same text + seed: conditioning is the ONLY per-row delta
                {"text": "same words", "model": 0, "seed": 5,
                 "voice": 0, "controls": [0.0, 0.0]},
                {"text": "same words", "model": 0, "seed": 5,
                 "voice": 1, "controls": [0.0, 0.0]},
                {"text": "same words", "model": 0, "seed": 5,
                 "voice": 0, "controls": [1.0, -1.0]},
            ]
            # warm compile with a solo request first (bucket B=1)
            r = await client.post("/generate", json=reqs[0])
            assert r.status == 200, await r.text()

            calls0 = srv.BATCH_CALLS[0]
            rs = await asyncio.gather(*[
                client.post("/generate", json=q) for q in reqs])
            paths = []
            for r in rs:
                assert r.status == 200, await r.text()
                paths.append((await r.json())["path"])
            assert srv.BATCH_CALLS[0] - calls0 == 1, "did not coalesce"

            wavs = [read_wav(p)[0] for p in paths]
            # (a) conditioning flows per row: speaker delta and controls
            # delta both change the audio
            def differ(a, b):
                return a.shape != b.shape or float(np.abs(a - b).max()) > 1e-4
            assert differ(wavs[0], wavs[1]), "speaker_id did not flow per row"
            assert differ(wavs[0], wavs[2]), "controls did not flow per row"

            # (b) each row matches its own solo run
            for q, wav_b in zip(reqs, wavs):
                r = await client.post("/generate", json=q)
                wav_s = read_wav((await r.json())["path"])[0]
                assert wav_b.shape == wav_s.shape
                np.testing.assert_allclose(wav_b, wav_s, atol=1e-3, rtol=0)

    asyncio.run(run())


def test_microbatcher_pipelines_windows(monkeypatch):
    """MicroBatcher depth (VERDICT r4 #2): with depth=2 consecutive
    windows' synthesis calls OVERLAP (window N+1 dispatches while window
    N runs — the double-buffering that hides the wav-fetch tunnel time);
    with depth=1 windows are strictly sequential (the r4 behavior). Each
    request still resolves to its own path in both modes."""
    import asyncio
    import threading
    import time

    from run import server as srv

    class Reg:
        def load(self, idx):
            return ("cfg-stub",)

    monkeypatch.setattr(srv, "_validate_request", lambda cfg, r: None)
    active, max_active = [0], [0]
    lock = threading.Lock()

    def fake_synth(bundle, reqs):
        with lock:
            active[0] += 1
            max_active[0] = max(max_active[0], active[0])
        time.sleep(0.15)  # long enough that in-flight windows overlap
        with lock:
            active[0] -= 1
        return [r["out_path"] for r in reqs]

    monkeypatch.setattr(srv, "_synthesize_batch", fake_synth)

    def drive(depth):
        async def run():
            max_active[0] = 0
            # max_batch=1 -> every request is its own window
            mb = srv.MicroBatcher(Reg(), window_ms=1, max_batch=1,
                                  depth=depth)
            res = await asyncio.gather(*[
                mb.submit(0, {"text": "x", "out_path": f"p{i}"})
                for i in range(4)
            ])
            await mb.close()
            assert res == [f"p{i}" for i in range(4)]
            return max_active[0]

        return asyncio.run(run())

    assert drive(1) == 1, "depth=1 must serialize windows"
    assert drive(2) >= 2, "depth=2 never overlapped consecutive windows"
