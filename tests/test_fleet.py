"""Device-fleet serving (serve/fleet.py): N per-device engines (or per-TP-
submesh engines) behind one submit() — the reference's one-model-per-GPU
worker fleet / per-GPU eval processes (`model_worker.py`,
`evaluate_instructions.py:231-266`) folded into a single process. The fleet
must emit token-for-token what a single engine emits, isolate per-engine
failures, and drive the eval harness and batch worker."""

import numpy as np
import jax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.generation.continuous import ContinuousBatcher
from radvlm_tpu.generation.engine import GenerationConfig
from radvlm_tpu.models import multimodal, radvlm
from radvlm_tpu.serve.fleet import FleetEngine


@pytest.fixture(scope="module")
def setup():
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    return cfg, params


def _mk_sample(cfg, rng, n_text):
    img = rng.integers(0, 255, size=(90, 70, 3), dtype=np.uint8)
    ids = list(rng.integers(3, cfg.text.vocab_size, size=n_text))
    ids = ids[:2] + [IMAGE_TOKEN_INDEX] + ids[2:]
    return multimodal.build_sample(ids, [img], cfg)


ENGINE_KW = dict(
    num_slots=2, max_len=256, prompt_buckets=(128,), pad_tiles=2,
    attn_impl="xla",
)


def _single_ref(params, cfg, samples, steps):
    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        **ENGINE_KW,
    )
    reqs = [b.submit(s) for s in samples]
    done = {r.uid: r.emitted for r in b.run()}
    return [done[r.uid] for r in reqs]


@pytest.mark.parametrize("n_engines,tp_size", [(4, 1), (2, 2)])
@pytest.mark.slow
def test_fleet_matches_single_engine(setup, rng, n_engines, tp_size):
    cfg, params = setup
    steps = 5
    samples = [_mk_sample(cfg, rng, n) for n in (6, 11, 8, 9, 7)]
    ref = _single_ref(params, cfg, samples, steps)

    fleet = FleetEngine(
        params, cfg, GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        devices=jax.local_devices()[: n_engines * tp_size],
        tp_size=tp_size, **ENGINE_KW,
    )
    assert len(fleet.batchers) == n_engines
    if tp_size == 1:
        # each engine's weights + cache are COMMITTED to its own device
        devs = []
        for b in fleet.batchers:
            leaf = jax.tree_util.tree_leaves(b.params)[0]
            (d,) = leaf.devices()
            assert leaf.committed
            assert b.cache[0].devices() == {d}
            devs.append(d)
        assert len(set(devs)) == n_engines
    reqs = [fleet.submit(s) for s in samples]
    # least-loaded routing spread the pre-start submissions across engines
    loads = [b.queue.qsize() for b in fleet.batchers]
    assert max(loads) - min(loads) <= 1
    fleet.start()
    done = {r.uid: r for r in fleet.drain(idle_timeout=300)}
    fleet.shutdown()
    assert len(done) == len(samples)
    for i, r in enumerate(reqs):
        assert done[r.uid].error is None
        assert done[r.uid].emitted == ref[i]


def test_fleet_error_isolation(setup, rng):
    """One engine's dispatch loop raising must fail exactly ITS requests
    (error set, done signalled) and leave the other engine serving."""
    cfg, params = setup
    samples = [_mk_sample(cfg, rng, n) for n in (6, 11, 8, 9)]
    fleet = FleetEngine(
        params, cfg, GenerationConfig(max_new_tokens=4, eos_token_ids=()),
        devices=jax.local_devices()[:2], **ENGINE_KW,
    )

    def boom():
        raise RuntimeError("boom")

    fleet.batchers[0].run = boom
    reqs = [fleet.submit(s) for s in samples]
    fleet.start()
    done = {r.uid: r for r in fleet.drain(idle_timeout=300)}
    fleet.shutdown()
    assert len(done) == len(samples)
    failed = [r for r in done.values() if r.error]
    ok = [r for r in done.values() if not r.error]
    assert len(failed) == 2 and len(ok) == 2  # alternating least-loaded routing
    assert all("boom" in r.error for r in failed)
    assert all(len(r.emitted) == 4 for r in ok)


def test_fleet_quarantines_broken_engine(setup, rng):
    """After QUARANTINE_AFTER consecutive failures an engine leaves the
    routing rotation — a request-free broken engine always looks
    least-loaded and would otherwise black-hole all new traffic."""
    import time

    from radvlm_tpu.serve.fleet import QUARANTINE_AFTER

    cfg, params = setup
    fleet = FleetEngine(
        params, cfg, GenerationConfig(max_new_tokens=3, eos_token_ids=()),
        devices=jax.local_devices()[:2], **ENGINE_KW,
    )

    def boom():
        raise RuntimeError("boom")

    fleet.batchers[0].run = boom
    fleet.start()
    deadline = time.time() + 30
    while fleet._errors[0] < QUARANTINE_AFTER and time.time() < deadline:
        time.sleep(0.05)
    assert fleet._errors[0] >= QUARANTINE_AFTER
    samples = [_mk_sample(cfg, rng, n) for n in (6, 11, 8, 9)]
    reqs = [fleet.submit(s) for s in samples]
    assert fleet.batchers[0].queue.qsize() == 0  # nothing routed to engine 0
    done = {r.uid: r for r in fleet.drain(idle_timeout=300)}
    fleet.shutdown()
    assert len(done) == 4 and all(not r.error for r in done.values())
    assert all(len(done[r.uid].emitted) == 3 for r in reqs)


def test_fleet_validates_device_count(setup):
    cfg, params = setup
    with pytest.raises(ValueError, match="needs 16 devices"):
        FleetEngine(
            params, cfg, GenerationConfig(max_new_tokens=1),
            fleet_size=16, **ENGINE_KW,
        )


class FakeReportDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "img": rng.integers(0, 255, size=(80, 64, 3), dtype=np.uint8),
            "instr": {"question": f"Describe study {i}."},
            "txt": f"Report {i}.",
        }


def test_harness_fleet_matches_single(setup):
    """run_task with a 2-engine fleet returns the same (question -> output)
    map as the single-engine continuous run (completion order may differ)."""
    from radvlm_tpu.eval.harness import VLMRunner, run_task

    cfg, params = setup

    class ByteTok:
        eos_token_ids = (1,)
        pad_token_id = 0

        def encode(self, text):
            return [2 + b for b in text.encode()][:32]

        def decode(self, ids):
            return bytes(min(255, i - 2) for i in ids if i >= 2).decode(
                errors="ignore"
            )

    def outputs(fleet):
        runner = VLMRunner(
            params=params, cfg=cfg, tokenizer=ByteTok(), max_new_tokens=4,
            batch_size=2, attn_impl="xla", fuse=False, fleet=fleet,
        )
        results, _ = run_task(
            runner, FakeReportDataset(6), "report_generation",
            with_clinical=False, engine="continuous",
        )
        # reference cell contract: "instr" is the question STRING
        return {r["instr"]: r["output"] for r in results}

    assert outputs(fleet=2) == outputs(fleet=None)


@pytest.mark.slow
def test_batch_worker_fleet(setup):
    """BatchWorker(fleet=2): requests route through the fleet and complete
    via the on_complete event path."""
    import base64
    import io

    from PIL import Image

    from radvlm_tpu.eval.harness import VLMRunner
    from radvlm_tpu.serve.batch_worker import BatchWorker

    cfg, params = setup

    class ByteTok:
        eos_token_ids = (1,)
        pad_token_id = 0

        def encode(self, text):
            return [2 + b for b in text.encode()][:32]

        def decode(self, ids):
            return bytes(min(255, i - 2) for i in ids if i >= 2).decode(
                errors="ignore"
            )

    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=ByteTok(), max_new_tokens=4,
        batch_size=2, attn_impl="xla", fuse=False,
    )
    worker = BatchWorker(
        runner, model_names=["tiny"], num_slots=2, max_len=256,
        prompt_bucket=128, fleet=2,
    )
    assert worker.fleet is not None and worker.batcher is None
    buf = io.BytesIO()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    out = worker.generate({
        "prompt": "<image>\ndescribe", "images": [b64], "max_new_tokens": 4,
    })
    assert out["error_code"] == 0
    worker.shutdown()
