"""Entity-overlap + RL-CIDEr metrics (eval/metrics/radentity.py, nlg.cider_d_rl)
and the vilmedic compute_scores registry dispatch (eval/metrics/__init__.py).

The scoring algorithms are exercised hermetically through the pluggable
backend seams (ner_fn/nli_fn/sim_fn) — the external models (stanza radiology
NER, BERT NLI, distilbert BERTScore) are not in this image, exactly like the
clinical.py sidecar policy.
"""

import json
import math
import os

import pytest

from radvlm_tpu.eval.metrics import compute_scores
from radvlm_tpu.eval.metrics.nlg import cider_d, cider_d_rl, corpus_doc_freq
from radvlm_tpu.eval.metrics.radentity import (
    Sentence,
    rad_entity_match_exact,
    rad_entity_nli,
    stanford_ct_abd_accuracy,
)


def fake_ner(entity_map):
    """NER backend from a {text: [[(token, is_entity), ...] per sentence]}
    spec keyed on the PREPROCESSED text (lowercase, ' .' -> '.')."""
    def run(texts):
        docs = []
        for t in texts:
            key = t.lower().replace(" .", ".")
            doc = []
            for sent in entity_map[key]:
                doc.append(Sentence(
                    tokens=[tok for tok, _ in sent],
                    entities=[tok for tok, is_e in sent if is_e],
                ))
            docs.append(doc)
        return docs
    return run


# ---------------------------------------------------------------------------
# RadEntityMatchExact
# ---------------------------------------------------------------------------


def test_match_exact_basic():
    ner = fake_ner({
        "no pleural effusion. normal heart size.": [
            [("no", False), ("pleural", True), ("effusion", True)],
            [("normal", False), ("heart", True), ("size", False)],
        ],
        "no pleural effusions.": [
            [("no", False), ("pleural", True), ("effusions", True)],
        ],
    })
    mean, scores, docs_h, docs_r = rad_entity_match_exact(
        ["no pleural effusions."], ["No pleural effusion. Normal heart size."],
        ner_fn=ner,
    )
    # hyp entities: pleural, effusion, heart; ref: pleural, effusions
    # match = 1 (pleural); pr = 1/3, rc = 1/2 -> f = 0.4
    assert scores == [pytest.approx(0.4)]
    assert mean == pytest.approx(0.4)
    assert docs_h[0][1].text == "normal heart size"


def test_match_exact_recall_numerator_quirk():
    # Reference `RadEntityMatchExact.py:41`: the recall numerator iterates
    # the HYP entities. Duplicate hyp entities inflate recall: hyp [a, a]
    # vs ref [a, b] scores f=1.0 even though b is never produced.
    ner = fake_ner({
        "a a.": [[("a", True), ("a", True)]],
        "a b.": [[("a", True), ("b", True)]],
    })
    mean, scores, _, _ = rad_entity_match_exact(
        ["a b."], ["a a."], ner_fn=ner
    )
    assert scores == [pytest.approx(1.0)]


def test_match_exact_zero_sides():
    ner = fake_ner({
        "x.": [[("x", False)]],      # no entities
        "a.": [[("a", True)]],
    })
    mean, scores, _, _ = rad_entity_match_exact(["a."], ["x."], ner_fn=ner)
    assert scores == [0.0]


# ---------------------------------------------------------------------------
# RadEntityNLI
# ---------------------------------------------------------------------------


def _nli_table(table):
    def run(premises, hypotheses):
        return [table[(p, h)] for p, h in zip(premises, hypotheses)]
    return run


def test_nli_hand_computed():
    # hyp: s0 "effusion present" (entity: effusion), s1 "heart normal"
    # (entity: heart); ref: r0 "no effusion" (entity: effusion), r1
    # "cardiomegaly" (entity: heart)
    ner = fake_ner({
        "effusion present. heart normal.": [
            [("effusion", True), ("present", False)],
            [("heart", True), ("normal", False)],
        ],
        "no effusion. heart big.": [
            [("no", False), ("effusion", True)],
            [("heart", True), ("big", False)],
        ],
    })
    # similarity pairs (cands=hyp sentences x refs=ref sentences row-major):
    # choose argmax so hyp s0 -> ref r0, hyp s1 -> ref r1
    sim_values = {
        ("effusion present", "no effusion"): 0.9,
        ("effusion present", "heart big"): 0.1,
        ("heart normal", "no effusion"): 0.1,
        ("heart normal", "heart big"): 0.8,
    }

    def sim(cands, refs):
        return [sim_values[(c, r)] for c, r in zip(cands, refs)]

    nli = _nli_table({
        # precision direction: premise = hyp sentence
        ("effusion present", "no effusion"): "contradiction",
        ("heart normal", "heart big"): "neutral",
        # recall direction: premise = ref sentence (sim is symmetric here;
        # f.T argmax maps r0 -> s0, r1 -> s1)
        ("no effusion", "effusion present"): "entailment",
        ("heart big", "heart normal"): "neutral",
    })
    mean, scores = rad_entity_nli(
        ["no effusion. heart big."], ["effusion present. heart normal."],
        ner_fn=ner, nli_fn=nli, sim_fn=sim,
    )
    # precision: s0 contradiction -> entity 'effusion' vetoed (total 1,
    #   match 0); s1 neutral -> 'heart' in ref entities (total 1, match 1)
    #   pr = 1/2
    # recall: r0 entailment -> +1 bonus, entity 'effusion' in hyp entities
    #   -> match 2, total 1; r1 neutral -> 'heart' matches -> match 1,
    #   total 1 -> rc = 3/2 (reference's >1 recall is possible by design)
    # f = 2*(0.5)*(1.5)/2 = 0.75
    assert scores == [pytest.approx(0.75)]
    assert mean == pytest.approx(0.75)


def test_nli_skips_unparsed_reports():
    ner = fake_ner({
        "a.": [[("a", True)]],
        "": [],  # no sentences -> the reference skips the pair entirely
    })
    nli = _nli_table({("a", "a"): "entailment"})
    sim = lambda c, r: [1.0] * len(c)
    mean, scores = rad_entity_nli(
        ["a.", ""], ["a.", "a."], ner_fn=ner, nli_fn=nli, sim_fn=sim,
    )
    assert len(scores) == 1  # second pair skipped, not scored 0


# ---------------------------------------------------------------------------
# Stanford CT-abd substring accuracy
# ---------------------------------------------------------------------------


def test_ct_abd_accuracy():
    refs = ["gallstones and bowel obstruction seen", "unremarkable study"]
    hyps = ["gallstones present", "unremarkable"]
    scores = stanford_ct_abd_accuracy(refs, hyps)
    # radiologist list: ref0 contains {gallstones, bowel obstruction};
    # hyp0 matches gallstones only -> 0.5. ref1 matches nothing -> skipped.
    assert scores["radiologist_labels_from_n_grams"] == pytest.approx(0.5)
    # chatgpt list: ref0 contains {gallstones, bowel obstruction, small
    # bowel? no — 'small bowel' not in ref0}; 'gallstones', 'bowel
    # obstruction' -> hyp0 matches 1 of 2 -> 0.5
    assert scores["chatgpt_labels_from_n_grams"] == pytest.approx(0.5)
    assert scores["averaged"] == pytest.approx(0.5)


def test_ct_abd_no_labels_in_refs():
    scores = stanford_ct_abd_accuracy(["nothing here"], ["nothing there"])
    assert scores["averaged"] == 0


# ---------------------------------------------------------------------------
# RL CIDEr-D
# ---------------------------------------------------------------------------


REPORTS = [
    "no acute cardiopulmonary process",
    "mild cardiomegaly with clear lungs",
    "right basilar atelectasis no effusion",
    "no acute process clear lungs",
]


def test_cider_rl_matches_plain_when_corpus_is_refs():
    refs = REPORTS
    hyps = ["no acute process", "cardiomegaly", "atelectasis", "clear lungs"]
    plain_mean, plain_scores = cider_d(refs, hyps)
    rl_mean, rl_scores = cider_d_rl(refs, hyps, corpus_doc_freq(refs))
    # identical DF source + identical log normalizer (len(refs)) -> bit-equal
    assert rl_scores == pytest.approx(plain_scores)
    assert rl_mean == pytest.approx(plain_mean)


def test_cider_rl_corpus_df_changes_scores():
    refs = REPORTS[:2]
    hyps = ["no acute cardiopulmonary process", "mild cardiomegaly"]
    small = cider_d_rl(refs, hyps, corpus_doc_freq(refs))
    # a larger corpus where 'no acute' n-grams are common -> lower idf for
    # them -> different per-sample rewards
    big = cider_d_rl(refs, hyps, corpus_doc_freq(REPORTS * 5))
    assert small[1] != pytest.approx(big[1])


def test_cider_rl_log_norm_override():
    refs = ["no acute process"]
    hyps = ["no acute process"]
    df = corpus_doc_freq(REPORTS)
    # per-sample call: default normalizer log(len(refs))=log(1)=0 flips the
    # idf NEGATIVE for common n-grams (tf * (0 - log df)) — a degenerate
    # reward. Pinning log_norm to log(corpus size) restores positive idf.
    default = cider_d_rl(refs, hyps, df)
    pinned = cider_d_rl(refs, hyps, df, log_norm=math.log(len(REPORTS)))
    assert pinned[0] > 0.0
    assert pinned[0] != pytest.approx(default[0])


def test_grpo_cider_reward(tmp_path):
    from radvlm_tpu.training.grpo import GRPOConfig, REWARD_FNS

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(REPORTS) + "\n")
    gc = GRPOConfig(reward="ciderdrl", cider_corpus=str(corpus))

    class Cell:
        solution = "no acute cardiopulmonary process"

    exact = REWARD_FNS["ciderdrl"]("no acute cardiopulmonary process", Cell(), gc)
    off = REWARD_FNS["ciderdrl"]("severe pneumothorax everywhere", Cell(), gc)
    assert exact > off >= 0.0
    assert REWARD_FNS["ciderdrl"]("", Cell(), gc) == 0.0


# ---------------------------------------------------------------------------
# compute_scores registry
# ---------------------------------------------------------------------------


def test_compute_scores_dispatch_and_dump(tmp_path):
    refs = REPORTS
    hyps = ["no acute process", "cardiomegaly", "atelectasis", "clear lungs"]
    ner = fake_ner({
        **{r.lower().replace(" .", "."): [[(w, True) for w in r.split()]]
           for r in refs + hyps},
    })
    scores = compute_scores(
        ["BLEU", "CIDERD", "ciderdrl", "ROUGE1", "ROUGEL",
         "radentitymatchexact", "stanford_ct_abd_accuracy"],
        refs, hyps,
        split="val", seed=7, epoch=3, dump_dir=str(tmp_path),
        corpus=REPORTS, ner_fn=ner,
    )
    assert set(scores) == {
        "BLEU", "CIDERD", "ciderdrl", "ROUGE1", "ROUGEL",
        "radentitymatchexact", "stanford_ct_abd",
    }
    assert (tmp_path / "val_7_refs.txt").read_text().splitlines() == refs
    assert (tmp_path / "val_7_hyps.txt").read_text().splitlines() == hyps
    dumped = json.loads((tmp_path / "val_7_metrics.txt").read_text())
    assert dumped["epoch"] == 3 and "BLEU" in dumped["scores"]


def test_compute_scores_contracts():
    with pytest.raises(AssertionError):
        compute_scores(["BLEU"], ["a"], ["a", "b"])
    with pytest.raises(ValueError, match="not implemented"):
        compute_scores(["nope"], ["a"], ["a"])
    with pytest.raises(ValueError, match="corpus"):
        compute_scores(["ciderdrl"], ["a"], ["a"])
    assert compute_scores([], ["a"], ["a"]) == {}


def test_compute_scores_accuracy():
    import numpy as np

    scores = compute_scores(
        ["accuracy"], [0, 1, 1], np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    )
    assert scores["accuracy"] == pytest.approx(66.67)
