"""JAX-native GREEN judge (eval/green_cli.py make_jax_judge): the radllama2
judge loads through our text importer and scores batched through the
continuous engine — greedy outputs must match torch HF `generate` on the
same tiny checkpoint (the reference's per-sample torchrun path,
`eval_green.py:20-26`)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402


def _byte_tokenizer():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="<|eos|>", pad_token="<|pad|>",
        model_input_names=["input_ids", "attention_mask"],
    )


@pytest.fixture(scope="module")
def llama_judge_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("green_judge")
    tok = _byte_tokenizer()
    tok.save_pretrained(path)
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=len(tok), hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, rope_theta=10000.0,
        tie_word_embeddings=False, eos_token_id=tok.eos_token_id,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(path)
    return str(path), model, tok


def test_jax_judge_matches_torch_generate(llama_judge_dir):
    from radvlm_tpu.eval.green_cli import make_jax_judge

    path, model, tok = llama_judge_dir
    judge = make_jax_judge(path, max_new_tokens=8, num_slots=2,
                           dtype=jnp.float32)
    assert judge.batched
    prompts = ["Reference report: clear lungs.", "Candidate: effusion seen."]
    got = judge(prompts)
    assert len(got) == 2
    for p, text in zip(prompts, got):
        ids = tok(p, add_special_tokens=True).input_ids
        with torch.no_grad():
            out = model.generate(
                torch.tensor([ids]), max_new_tokens=8, do_sample=False,
                pad_token_id=tok.pad_token_id,
            )
        expect = tok.decode(out[0][len(ids):], skip_special_tokens=True)
        assert text == expect


def test_local_jax_client_runs_synth_pipeline(llama_judge_dir, tmp_path):
    """LocalJAXClient (data/llm_clients.py): the report-filter synthesis
    pipeline runs against a local LM on the engine instead of Azure."""
    from radvlm_tpu.data.llm_clients import LocalJAXClient
    from radvlm_tpu.data.synth import filter_reports

    path, _, _ = llama_judge_dir
    client = LocalJAXClient(path, max_tokens=8, num_slots=2)
    out = client.complete("Remove prior references: lungs clear.")
    assert isinstance(out, str)
    batch = client.complete_batch(["a", "b", "c"])
    assert len(batch) == 3 and all(isinstance(t, str) for t in batch)

    samples = [
        {"study_id": f"s{i}", "txt": f"Report {i} with priors."}
        for i in range(3)
    ]
    outdir = tmp_path / "filtered"
    n = filter_reports(samples, client, str(outdir))
    assert n == 3
    assert sorted(p.name for p in outdir.iterdir()) == [
        "s0.txt", "s1.txt", "s2.txt"
    ]


def test_green_cli_jax_judge_end_to_end(llama_judge_dir, tmp_path, capsys):
    from radvlm_tpu.eval.green_cli import main

    path, _, _ = llama_judge_dir
    outputs = [
        {"txt": "No acute findings.", "output": "Normal chest."},
        {"txt": "Cardiomegaly.", "output": "Enlarged heart."},
    ]
    outs = tmp_path / "outputs.json"
    outs.write_text(json.dumps(outputs))
    save = tmp_path / "green.json"
    main(["--outputs", str(outs), "--judge", "jax", "--judge-model", path,
          "--judge-slots", "2", "--save", str(save)])
    assert "GREEN mean:" in capsys.readouterr().out
    dumped = json.loads(save.read_text())
    assert "green_mean" in dumped and len(dumped["scores"]) == 2
