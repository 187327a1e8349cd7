"""Evaluation harness: batched VLM inference over task datasets + metrics.

Rebuild of `radvlm/evaluation/evaluate_instructions.py`: the reference runs 1
sample/GPU-process with accelerate `PartialState` + `DistributedSampler` +
`gather_object` (`:231-266`); here a single process drives the whole chip with
*batched* KV-cached generation (length-bucketed, left-padded prompts -> one
compiled graph per bucket), and multi-host runs shard the dataset by
`jax.process_index()` and gather with `multihost_utils.process_allgather`.

Task -> dataset wiring matches `evaluate_instructions.py:47-116`; prompting uses
the qwen chatml template the reference's LLaVA-OV path uses.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from radvlm_tpu.config import RadVLMConfig
from radvlm_tpu.data.chat import QWEN_CHATML, ChatTemplate, render_generation_prompt
from radvlm_tpu.data.datasets import CHEXPERT_PATHOLOGIES
from radvlm_tpu.eval import metrics as metrics_lib
from radvlm_tpu.generation.engine import (
    GenerationConfig,
    make_generate_fn,
    trim_at_stop_strings,
)
from radvlm_tpu.models import multimodal


class Tokenizer:
    """Protocol: encode/decode + special ids. Production impl wraps an HF
    tokenizer (`load_hf_tokenizer`); tests inject fakes."""

    def encode(self, text: str) -> List[int]:
        raise NotImplementedError

    def decode(self, ids: Sequence[int]) -> str:
        raise NotImplementedError

    eos_token_ids: Tuple[int, ...] = ()
    pad_token_id: int = 0


class HFTokenizer(Tokenizer):
    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path)
        eos = [self.tok.eos_token_id]
        im_end = self.tok.convert_tokens_to_ids("<|im_end|>")
        if im_end is not None and im_end != self.tok.unk_token_id:
            eos.append(im_end)
        self.eos_token_ids = tuple(i for i in dict.fromkeys(eos) if i is not None)
        self.pad_token_id = self.tok.pad_token_id or 0

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self.tok.decode(ids, skip_special_tokens=True)


@dataclasses.dataclass
class VLMRunner:
    """Bundles params + config + tokenizer and runs batched generation.

    Caches one compiled generate fn per (batch, prompt-bucket) shape.
    """

    params: Any
    cfg: RadVLMConfig
    tokenizer: Tokenizer
    template: ChatTemplate = QWEN_CHATML
    max_new_tokens: int = 512
    batch_size: int = 8
    pad_to_multiple: int = 512
    attn_impl: str = "auto"
    fuse: bool = True  # fuse qkv/gateup projections for decode (qwen2.fuse_projections)
    # Tensor-parallel continuous inference: a jax Mesh with a `tensor` axis
    # spans the model across chips (parallel/tp.py) for the continuous-engine
    # paths (eval harness `engine="continuous"`, serve/batch_worker). TP
    # requires the unfused layout, so `fuse` is ignored under a mesh.
    mesh: Any = None
    kv_quant: Optional[bool] = None  # int8 KV cache (None -> RADVLM_KV_INT8)
    # Data-parallel engine fleet (serve/fleet.py): `fleet` engines of
    # `fleet_tp` chips each drive the continuous-engine paths — the
    # reference's one-model-per-GPU eval processes
    # (`evaluate_instructions.py:231-266`), folded into one process.
    fleet: Optional[int] = None
    fleet_tp: int = 1

    def __post_init__(self):
        if self.fuse and self.mesh is None and self.fleet_tp == 1:
            from radvlm_tpu.models import radvlm

            self.params = radvlm.fuse_for_inference(self.params, self.cfg)
        self._gen_fns: Dict[Tuple[int, int], Callable] = {}
        self._rng_seed = 0

    def _gen_fn(self, gen: GenerationConfig):
        import jax

        key = (gen.max_new_tokens,)
        if key not in self._gen_fns:
            self._gen_fns[key] = make_generate_fn(
                self.cfg, gen, attn_impl=self.attn_impl
            )
        return self._gen_fns[key]

    def build_prompt(
        self, question: str, history: Sequence[Tuple[str, str]] = ()
    ) -> str:
        turns = list(history) + [("user", question)]
        return render_generation_prompt(turns, template=self.template)

    def generate_batch(
        self,
        prompts: Sequence[str],
        images_per_prompt: Sequence[Sequence[np.ndarray]],
        *,
        max_new_tokens: Optional[int] = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
    ) -> List[str]:
        """prompts contain <image> markers; returns decoded, stop-trimmed text."""
        import jax
        import jax.numpy as jnp

        gen = GenerationConfig(
            max_new_tokens=max_new_tokens or self.max_new_tokens,
            eos_token_ids=self.tokenizer.eos_token_ids,
            pad_token_id=self.tokenizer.pad_token_id,
            temperature=temperature,
            top_p=top_p,
        )
        samples = [
            multimodal.build_sample(
                multimodal.tokenize_with_images(self.tokenizer.encode, p),
                imgs,
                self.cfg,
            )
            for p, imgs in zip(prompts, images_per_prompt)
        ]
        # Pad the batch up to batch_size so every call hits the same compiled
        # shape (duplicate the last sample as filler).
        n_real = len(samples)
        while len(samples) < self.batch_size:
            samples.append(samples[-1])
        batch = multimodal.collate(
            samples, pad_to_multiple=self.pad_to_multiple, left_pad=True
        )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self._rng_seed += 1
        out = self._gen_fn(gen)(self.params, batch, jax.random.key(self._rng_seed))
        toks = np.asarray(out["tokens"])
        nums = np.asarray(out["num_tokens"])
        texts = []
        for i in range(n_real):
            ids = [t for t in toks[i, : nums[i]] if t not in gen.eos_token_ids]
            text = self.tokenizer.decode(ids)
            texts.append(trim_at_stop_strings(text, self.template.stop_strings))
        return texts


# ---------------------------------------------------------------------------
# Task registry (mirrors evaluate_instructions.py:47-116)
# ---------------------------------------------------------------------------


def build_task_dataset(task: str, data_dir: str, **overrides):
    """task name -> configured dataset adapter over $DATA_DIR layout."""
    from radvlm_tpu.data import datasets as ds

    d = data_dir
    if task == "report_generation":
        return ds.MIMICCXRDataset(
            os.path.join(d, "MIMIC-CXR-JPG"), split="test", only_frontal=True,
            filtered_reports_dir=overrides.get("filtered_reports_dir"),
            flag_img=True, flag_lab=False, **_rest(overrides, "filtered_reports_dir"),
        )
    if task == "abnormality_classification":
        return ds.MIMICCXRDataset(
            os.path.join(d, "MIMIC-CXR-JPG"), split="test", only_frontal=True,
            classif=True, **overrides,
        )
    if task == "abnormality_grounding":
        return ds.VinDrCXRSingleLabelDataset(
            os.path.join(d, "VinDr-CXR"), split="test", **overrides
        )
    if task == "abnormality_detection":
        return ds.VinDrCXRDataset(
            os.path.join(d, "VinDr-CXR"), split="test", **overrides
        )
    if task == "anatomical_grounding":
        return ds.ChestImaGenomeDataset(
            root=os.path.join(d, "MIMIC-CXR-JPG"),
            chestima_root=os.path.join(d, "CHEST_IMA"),
            split="test", pick_one_region=True, **overrides,
        )
    if task == "phrase_grounding":
        return ds.MSCXRDataset(
            root=os.path.join(d, "MIMIC-CXR-JPG"), split="test",
            sentences_bbox_dir=os.path.join(d, "MS-CXR", "sentences_and_BBox_mscxr"),
            **overrides,
        )
    raise ValueError(f"unknown task {task!r}")


def _rest(d, *drop):
    return {k: v for k, v in d.items() if k not in drop}


METRIC_TASK_ALIAS = {
    "anatomical_grounding": "region_grounding",
}

def _result_cell(output: str, s: Dict, task: str) -> Dict:
    """One per-sample results cell in the REFERENCE's serialization contract
    (`evaluate_instructions.py:182-190`): `output` (generated text), `instr`
    (the question STRING), `answer` (the ground-truth answer text), plus any
    of the reference's optional keys present on the sample — so downstream
    consumers of the reference's `*_output.json` files can read ours."""
    instr = s.get("instr")
    if not isinstance(instr, dict) or "question" not in instr:
        # Fail loudly like the rest of the eval path (engine errors raise):
        # a sample with no instr would silently serialize instr/answer=null
        # and poison downstream metric joins.
        raise ValueError(
            f"sample for task {task!r} has no instr dict with a question: "
            f"keys={sorted(s.keys())}"
        )
    cell = {
        "output": output,
        "instr": instr.get("question"),
        "answer": instr.get("answer"),
    }
    for key in ("id", "idx", "img_path", "labels", "label", "txt", "boxes"):
        if key in s:
            cell[key] = s[key]
    for f in GT_FIELDS[task]:
        cell.setdefault(f, s.get(f))
    return cell


GT_FIELDS = {
    "report_generation": ("txt",),
    "abnormality_classification": ("labels",),
    "abnormality_grounding": ("boxes", "label"),
    "abnormality_detection": ("boxes", "labels"),
    "anatomical_grounding": ("boxes", "label"),
    "phrase_grounding": ("boxes", "label"),
}


def _allgather_objects(objs):
    """Gather arbitrary python objects (result dicts with STRING leaves and
    ragged per-process counts) across hosts.

    `multihost_utils.process_allgather` only handles uniform numeric arrays —
    feeding it the result dicts crashes on str leaves and ragged lengths
    (code-review repro). Serialize to JSON bytes, allgather the (padded)
    uint8 buffers plus their lengths, deserialize everything.
    Role of the reference's accelerate `gather_object`
    (`evaluate_instructions.py:265-266`)."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        _json.dumps(
            objs, default=lambda o: o.tolist() if hasattr(o, "tolist") else str(o)
        ).encode("utf-8"),
        dtype=np.uint8,
    )
    lengths = multihost_utils.process_allgather(
        jnp.asarray([payload.size], jnp.int32)
    )
    lengths = np.asarray(lengths).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(padded))
    ).reshape(len(lengths), max_len)
    out = []
    for row, n in zip(gathered, lengths):
        out.extend(_json.loads(bytes(row[: int(n)]).decode("utf-8")))
    return out


def _run_continuous(
    runner: VLMRunner, dataset, task: str, my_indices, progress
) -> List[Dict]:
    """Continuous-batching inference: all samples stream through a slot-refilled
    batcher (no idle slots waiting for the longest sequence in a batch)."""
    from radvlm_tpu.generation.continuous import ContinuousBatcher

    gen = GenerationConfig(
        max_new_tokens=runner.max_new_tokens,
        eos_token_ids=runner.tokenizer.eos_token_ids,
        pad_token_id=runner.tokenizer.pad_token_id,
    )
    # Pass 1 — bucket sizing only: build each sample, keep its LENGTH, drop
    # the tiles/raw image immediately. Holding the whole shard's raw images +
    # tiled samples resident (the previous approach) is O(dataset) host RAM —
    # tens of GB on the 3,314-study report-gen split (code-review finding).
    def build_mm(i):
        s = dict(dataset[i])  # shallow copy: never mutate the adapter's dict
        prompt = runner.build_prompt("<image>\n" + s["instr"]["question"])
        img = s.pop("img")  # drop OUR reference to the raw pixels after tiling
        mm = multimodal.build_sample(
            multimodal.tokenize_with_images(runner.tokenizer.encode, prompt),
            [img], runner.cfg,
        )
        return s, mm

    longest = 128
    for i in my_indices:
        _, mm = build_mm(i)
        longest = max(longest, mm.length)
    bucket = -(-longest // 128) * 128
    max_len = bucket + (-(-runner.max_new_tokens // 128) * 128)
    n_engines = 1
    if runner.fleet:
        from radvlm_tpu.serve.fleet import FleetEngine

        n_engines = runner.fleet
        engine = FleetEngine(
            runner.params, runner.cfg, gen,
            fleet_size=n_engines,
            tp_size=runner.fleet_tp,
            num_slots=runner.batch_size,
            max_len=max_len,
            prompt_buckets=(bucket,),
            attn_impl=runner.attn_impl,
            kv_quant=runner.kv_quant,
        ).start()
        submit, drain = engine.submit, engine.drain
    else:
        batcher = ContinuousBatcher(
            runner.params, runner.cfg, gen,
            num_slots=runner.batch_size,
            max_len=max_len,
            prompt_buckets=(bucket,),
            attn_impl=runner.attn_impl,
            mesh=runner.mesh,
            kv_quant=runner.kv_quant,
        )
        submit, drain = batcher.submit, batcher.run
    # Pass 2 — a FEEDER THREAD streams samples in continuously under a
    # bounded in-flight cap (submit() transfers batches to device
    # immediately; a whole-shard upfront submission would pin the full
    # split's collated batches in HBM). The r03 wave loop (submit a wave,
    # drain it fully, submit the next) measured a 1.85x fleet SLOWDOWN on
    # the CPU-mesh rehearsal: every engine idled through each wave's tail
    # and through the next wave's single-threaded host preprocessing.
    # Overlapping feed with drain keeps all engines' slots full for the
    # whole run and hides build_mm (PIL anyres) behind device time.
    import threading
    import time as _time

    cap = max(4 * runner.batch_size * n_engines, 8)
    inflight = threading.Semaphore(cap)
    stop_feed = threading.Event()
    meta: Dict[int, Dict] = {}
    meta_lock = threading.Lock()
    results = []
    feed_err: List[BaseException] = []

    def feed():
        try:
            for i in my_indices:
                inflight.acquire()
                if stop_feed.is_set():  # consumer bailed: unblock + exit
                    return
                s, mm = build_mm(i)
                req = submit(mm)
                with meta_lock:
                    meta[req.uid] = s
        except BaseException as e:  # surfaced in the consumer loop
            feed_err.append(e)

    feeder = threading.Thread(target=feed, name="eval-feeder", daemon=True)
    feeder.start()
    try:
        while len(results) < len(my_indices):
            if feed_err:
                raise feed_err[0]
            progressed = False
            # drain() / run() returns when nothing is pending — transiently
            # possible while the feeder preprocesses — so re-enter.
            for req in drain():
                progressed = True
                if req.error:
                    # an eval with silently-failed samples would report
                    # corrupt metrics — fail the run loudly
                    raise RuntimeError(f"engine failed a sample: {req.error}")
                # submit() -> meta[uid] in the feeder races completion by
                # microseconds; spin until the entry lands.
                while True:
                    with meta_lock:
                        s = meta.pop(req.uid, None)
                    if s is not None:
                        break
                    _time.sleep(0.001)
                inflight.release()
                text = runner.tokenizer.decode(req.emitted)
                cell = _result_cell(
                    trim_at_stop_strings(text, runner.template.stop_strings),
                    s, task,
                )
                results.append(cell)
                if progress:
                    progress(len(results), len(my_indices))
            if not progressed and len(results) < len(my_indices):
                _time.sleep(0.01)
        feeder.join()
    finally:
        # Unblock a feeder stuck on the in-flight cap (error exits above):
        # plain Semaphore tolerates the over-release; the stop flag makes the
        # feeder exit without submitting.
        stop_feed.set()
        inflight.release()
        if runner.fleet:
            engine.shutdown()
    return results


def run_task(
    runner: VLMRunner,
    dataset,
    task: str,
    *,
    max_samples: Optional[int] = None,
    output_dir: Optional[str] = None,
    model_name: str = "radvlm",
    with_clinical: bool = True,
    engine: str = "continuous",  # "continuous" (slot-refilled) | "static" (padded batches)
    progress: Optional[Callable[[int, int], None]] = None,
) -> Tuple[List[Dict], Dict[str, float]]:
    """Run inference over `dataset` and compute task metrics.

    Multi-host: each process takes indices i with i % num_processes ==
    process_index (the DistributedSampler contract) and results are allgathered.
    """
    import jax

    n = len(dataset)
    if max_samples is not None:
        n = min(n, max_samples)
    pidx, pcount = jax.process_index(), jax.process_count()
    my_indices = list(range(pidx, n, pcount))

    results: List[Dict] = []
    if engine == "continuous":
        results = _run_continuous(runner, dataset, task, my_indices, progress)
    else:
        bs = runner.batch_size
        for start in range(0, len(my_indices), bs):
            chunk = my_indices[start:start + bs]
            samples = [dataset[i] for i in chunk]
            prompts = [
                runner.build_prompt("<image>\n" + s["instr"]["question"])
                for s in samples
            ]
            images = [[s["img"]] for s in samples]
            outputs = runner.generate_batch(prompts, images)
            for s, out in zip(samples, outputs):
                results.append(_result_cell(out, s, task))
            if progress:
                progress(min(start + bs, len(my_indices)), len(my_indices))

    if pcount > 1:
        results = _allgather_objects(results)

    metric_task = METRIC_TASK_ALIAS.get(task, task)
    metrics = metrics_lib.evaluate_results(
        metric_task,
        results,
        labels=[p.lower() for p in CHEXPERT_PATHOLOGIES],
        with_clinical=with_clinical,
    )

    if output_dir and jax.process_index() == 0:
        os.makedirs(output_dir, exist_ok=True)
        # Reference file-name contract (`evaluate_instructions.py:195-207`,
        # save_results): `{model}_{task}_output.json` = per-sample cells,
        # `{model}_{task}.json` = the metrics dict.
        base = os.path.join(output_dir, f"{model_name}_{task}")
        with open(base + "_output.json", "w") as f:
            json.dump(results, f)
        with open(base + ".json", "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f, indent=2)
    return results, metrics
