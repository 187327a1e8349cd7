"""Baseline-zoo adapters executed END TO END against real transformers models
(tiny random weights saved to local checkpoints — no network). Upgrades the
zoo from "prompt builders tested, inference never run" to "the load ->
chat-template -> processor -> generate -> decode path executes for the
transformers-native baselines" (`models_loading_inference.py:90-112,382-483`).

torchvision (absent from the image) is needed ONLY by transformers' video
processors, which every multimodal processor class now requires at
construction; the shim below fakes the module tree and swaps the dummy
BaseVideoProcessor for the real one — no video is ever processed. LLaVA-Med
runs e2e through the in-repo rebuild (`eval/llavamed.py`) on a tiny local
checkpoint; CheXagent / MAIRA-2 / RaDialog additionally need hub-side custom
code (trust_remote_code) or external repos and stay weight-blocked.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

TILE = 56


@pytest.fixture(scope="module")
def torchvision_shim():
    """Apply the torchvision fakes + transformers patches for this module's
    tests and REVERT the transformers-global mutations afterwards (other
    tests in the session must keep seeing the honest availability state;
    the inert fake sys.modules entries stay — nothing else imports
    torchvision, transformers gates on its cached flags)."""

    def fake(name):
        # augment any pre-existing fake (test_eva_parity installs a minimal
        # one) rather than clobbering it
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
        return m

    import enum

    tv = fake("torchvision")
    tv.__version__ = getattr(tv, "__version__", "0.20.0")
    tv.transforms = fake("torchvision.transforms")
    tv.transforms.v2 = fake("torchvision.transforms.v2")
    tv.transforms.v2.functional = fake("torchvision.transforms.v2.functional")
    tv.io = fake("torchvision.io")

    class InterpolationMode(enum.Enum):
        NEAREST = "nearest"
        NEAREST_EXACT = "nearest-exact"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"
        BOX = "box"
        HAMMING = "hamming"
        LANCZOS = "lanczos"

    tv.transforms.InterpolationMode = InterpolationMode
    tv.transforms.v2.InterpolationMode = InterpolationMode

    # Import every lazily-resolved transformers class BEFORE lying about
    # torchvision availability: the auto_docstring machinery inside the lazy
    # model imports takes a different (broken) path once the backend check
    # flips, so resolve the modules while the flag is still honest.
    from transformers import (  # noqa: F401
        LlavaOnevisionConfig,
        LlavaOnevisionForConditionalGeneration,
        LlavaOnevisionImageProcessor,
        LlavaOnevisionProcessor,
        Qwen2TokenizerFast,
        Qwen2VLConfig,
        Qwen2VLForConditionalGeneration,
        Qwen2VLProcessor,
    )

    import transformers.processing_utils as pu
    import transformers.utils.import_utils as iu
    from transformers.video_processing_utils import BaseVideoProcessor

    from transformers.models.auto.video_processing_auto import (
        AutoVideoProcessor,
    )

    _MISSING = object()
    saved_module_attrs = {
        attr: pu.transformers_module.__dict__.get(attr, _MISSING)
        for attr in ("BaseVideoProcessor", "AutoVideoProcessor")
    }
    pu.transformers_module.BaseVideoProcessor = BaseVideoProcessor
    pu.transformers_module.AutoVideoProcessor = AutoVideoProcessor
    # the auto mapping nulled EVERY entry at import (torchvision "absent");
    # video_processor_class_from_name iterates all of them, so drop the None
    # rows and restore the two classes these tests use.
    from transformers.models.auto import video_processing_auto as vpa

    saved_mapping = dict(vpa.VIDEO_PROCESSOR_MAPPING_NAMES)
    for k in [k for k, v in vpa.VIDEO_PROCESSOR_MAPPING_NAMES.items()
              if v is None]:
        del vpa.VIDEO_PROCESSOR_MAPPING_NAMES[k]
    vpa.VIDEO_PROCESSOR_MAPPING_NAMES["llava_onevision"] = (
        "LlavaOnevisionVideoProcessor"
    )
    vpa.VIDEO_PROCESSOR_MAPPING_NAMES["qwen2_vl"] = "Qwen2VLVideoProcessor"
    # name->class resolution goes through the lazy model packages whose video
    # exports were nulled too; resolve the two classes directly.
    from transformers.models.llava_onevision.video_processing_llava_onevision import (  # noqa: E501
        LlavaOnevisionVideoProcessor,
    )
    from transformers.models.qwen2_vl.video_processing_qwen2_vl import (
        Qwen2VLVideoProcessor,
    )

    real = {"LlavaOnevisionVideoProcessor": LlavaOnevisionVideoProcessor,
            "Qwen2VLVideoProcessor": Qwen2VLVideoProcessor}
    orig_from_name = vpa.video_processor_class_from_name
    vpa.video_processor_class_from_name = (
        lambda n: real.get(n) or orig_from_name(n)
    )
    # requires_backends consults BACKENDS_MAPPING at call time; the cached
    # availability flag was frozen False when transformers first imported.
    saved_backend = iu.BACKENDS_MAPPING["torchvision"]
    iu.BACKENDS_MAPPING["torchvision"] = (lambda: True, saved_backend[1])

    yield

    vpa.video_processor_class_from_name = orig_from_name
    vpa.VIDEO_PROCESSOR_MAPPING_NAMES.clear()
    vpa.VIDEO_PROCESSOR_MAPPING_NAMES.update(saved_mapping)
    iu.BACKENDS_MAPPING["torchvision"] = saved_backend
    for attr, value in saved_module_attrs.items():
        if value is _MISSING:
            delattr(pu.transformers_module, attr)
        else:
            setattr(pu.transformers_module, attr, value)


def _byte_tokenizer(extra_specials, cls=None):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    byte_alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_alphabet))}
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    fast = (cls or PreTrainedTokenizerFast)(
        tokenizer_object=tok, eos_token="<|eos|>", pad_token="<|pad|>",
        model_input_names=["input_ids", "attention_mask"],
    )
    fast.add_special_tokens({"additional_special_tokens": list(extra_specials)})
    return fast


def _chat_template(image_snippet):
    return (
        "{% for message in messages %}<|im_start|>{{ message['role'] }}\n"
        "{% for c in message['content'] %}"
        "{% if c['type'] == 'image' %}" + image_snippet +
        "{% elif c['type'] == 'text' %}{{ c['text'] }}"
        "{% endif %}{% endfor %}<|im_end|>\n{% endfor %}"
        "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
    )


@pytest.fixture()
def cxr_png(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    p = tmp_path / "cxr.png"
    Image.fromarray(
        rng.integers(0, 255, size=(120, 100, 3), dtype=np.uint8)
    ).save(p)
    return str(p)


@pytest.fixture()
def llava_ov_checkpoint(tmp_path, torchvision_shim):
    from transformers import (
        LlavaOnevisionConfig,
        LlavaOnevisionForConditionalGeneration,
        LlavaOnevisionImageProcessor,
        LlavaOnevisionProcessor,
    )
    from transformers.models.llava_onevision.video_processing_llava_onevision import (
        LlavaOnevisionVideoProcessor,
    )

    tokenizer = _byte_tokenizer(["<image>"])
    image_token_id = tokenizer.convert_tokens_to_ids("<image>")
    torch.manual_seed(0)
    pinpoints = [[i * TILE, j * TILE] for i in range(1, 3) for j in range(1, 3)]
    cfg = LlavaOnevisionConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=TILE, patch_size=14,
            vision_use_head=False,
        ),
        text_config=dict(
            model_type="qwen2", vocab_size=len(tokenizer), hidden_size=48,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=12, rope_theta=10000.0,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            max_position_embeddings=4096,
            eos_token_id=tokenizer.eos_token_id,
        ),
        image_grid_pinpoints=pinpoints,
        image_token_index=image_token_id,
        vision_feature_select_strategy="full",
        vision_feature_layer=-1,
        vision_aspect_ratio="anyres_max_9",
        use_image_newline_parameter=True,
    )
    model = LlavaOnevisionForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(tmp_path)
    image_processor = LlavaOnevisionImageProcessor(
        size={"height": TILE, "width": TILE},
        crop_size={"height": TILE, "width": TILE},
        image_grid_pinpoints=pinpoints,
    )
    processor = LlavaOnevisionProcessor(
        image_processor=image_processor, tokenizer=tokenizer,
        video_processor=LlavaOnevisionVideoProcessor(
            size={"height": TILE, "width": TILE},
        ),
        num_image_tokens=(TILE // 14) ** 2,
        vision_feature_select_strategy="full",
        chat_template=_chat_template("<image>"),
    )
    processor.save_pretrained(tmp_path)
    return str(tmp_path)


def test_llava_ov_baseline_runs_real_inference(llava_ov_checkpoint, cxr_png):
    from radvlm_tpu.eval.baselines import LlavaOneVisionBaseline, load_baseline

    b = load_baseline("llava-ov", llava_ov_checkpoint)
    assert isinstance(b, LlavaOneVisionBaseline)
    out = b.infer(cxr_png, "Provide a radiology report.", max_new_tokens=4)
    assert isinstance(out, str)
    # chat history goes through the same template path
    out2 = b.infer(
        cxr_png, "And the heart?", chat_history=[("Report?", "Normal.")],
        max_new_tokens=4,
    )
    assert isinstance(out2, str)


@pytest.fixture()
def qwen2vl_checkpoint(tmp_path, torchvision_shim):
    from transformers import (
        Qwen2TokenizerFast,
        Qwen2VLConfig,
        Qwen2VLForConditionalGeneration,
        Qwen2VLProcessor,
    )
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )
    from transformers.models.qwen2_vl.video_processing_qwen2_vl import (
        Qwen2VLVideoProcessor,
    )

    tokenizer = _byte_tokenizer(
        ["<|vision_start|>", "<|image_pad|>", "<|vision_end|>",
         "<|im_start|>", "<|im_end|>"],
        cls=Qwen2TokenizerFast,
    )
    torch.manual_seed(0)
    cfg = Qwen2VLConfig(
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=48, num_heads=2,
            in_chans=3, patch_size=14, spatial_merge_size=2,
            temporal_patch_size=2, mlp_ratio=2,
        ),
        vocab_size=len(tokenizer), hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, max_position_embeddings=4096,
        # 3D mrope sections must sum to head_dim/2 (48/4/2 = 6)
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=tokenizer.convert_tokens_to_ids("<|image_pad|>"),
        vision_start_token_id=tokenizer.convert_tokens_to_ids("<|vision_start|>"),
        vision_end_token_id=tokenizer.convert_tokens_to_ids("<|vision_end|>"),
        eos_token_id=tokenizer.eos_token_id,
    )
    model = Qwen2VLForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(tmp_path)
    image_processor = Qwen2VLImageProcessor(
        min_pixels=28 * 28, max_pixels=56 * 56, patch_size=14,
        temporal_patch_size=2, merge_size=2,
    )
    processor = Qwen2VLProcessor(
        image_processor=image_processor, tokenizer=tokenizer,
        video_processor=Qwen2VLVideoProcessor(),
        chat_template=_chat_template(
            "<|vision_start|><|image_pad|><|vision_end|>"
        ),
    )
    processor.save_pretrained(tmp_path)
    return str(tmp_path)


def test_qwen2vl_baseline_runs_real_inference(qwen2vl_checkpoint, cxr_png):
    from radvlm_tpu.eval.baselines import Qwen2VLBaseline, load_baseline

    b = load_baseline("qwen2vl", qwen2vl_checkpoint)
    assert isinstance(b, Qwen2VLBaseline)
    out = b.infer(cxr_png, "Provide a radiology report.", max_new_tokens=4)
    assert isinstance(out, str)


@pytest.fixture()
def llavamed_checkpoint(tmp_path):
    """Tiny llava-med-layout checkpoint dir: Mistral LM + CLIP tower + mlp2x
    projector combined under the reference key convention
    (`llava_med_loading.py` state-dict layout), plus a local tokenizer — no
    torchvision shim needed (CLIPImageProcessor only)."""
    import json

    from safetensors.torch import save_file
    from transformers import (
        CLIPVisionConfig,
        CLIPVisionModel,
        MistralConfig,
        MistralForCausalLM,
    )

    tokenizer = _byte_tokenizer(["<s>"])
    tokenizer.bos_token = "<s>"
    tokenizer.save_pretrained(tmp_path)

    torch.manual_seed(0)
    tower_cfg = dict(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=16,
    )
    lm_cfg = dict(
        vocab_size=len(tokenizer), hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=4096,
    )
    lm = MistralForCausalLM(MistralConfig(**lm_cfg))
    tower = CLIPVisionModel(CLIPVisionConfig(**tower_cfg))
    proj = torch.nn.Sequential(
        torch.nn.Linear(32, 48), torch.nn.GELU(), torch.nn.Linear(48, 48)
    )
    sd = dict(lm.state_dict())
    sd.update({
        f"model.vision_tower.vision_tower.{k}": v
        for k, v in tower.state_dict().items()
    })
    sd.update({
        f"model.mm_projector.{k}": v for k, v in proj.state_dict().items()
    })
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({**lm_cfg, "mm_vision_tower_cfg": tower_cfg,
                   "mm_vision_select_layer": -2}, f)
    return str(tmp_path)


CHEX_MODELING = '''
from transformers import LlamaConfig, LlamaForCausalLM


class TinyChexConfig(LlamaConfig):
    model_type = "tiny_chexagent"


class TinyChexForCausalLM(LlamaForCausalLM):
    config_class = TinyChexConfig
'''

CHEX_TOKENIZATION = '''
from transformers import PreTrainedTokenizerFast


class TinyChexTokenizer(PreTrainedTokenizerFast):
    """Interface stand-in for CheXagent's custom tokenizer: from_list_format
    inlines image paths, apply_chat_template renders from/value turns."""

    def from_list_format(self, items):
        parts = []
        for it in items:
            if "image" in it:
                parts.append("<img>" + it["image"] + "</img>")
            elif "text" in it:
                parts.append(it["text"])
        return "".join(parts)

    def apply_chat_template(self, conversation, add_generation_prompt=False,
                            return_tensors=None, **kw):
        text = "".join(
            "<|im_start|>" + m["from"] + "\\n" + m["value"] + "<|im_end|>\\n"
            for m in conversation
        )
        if add_generation_prompt:
            text += "<|im_start|>gpt\\n"
        ids = self(text, add_special_tokens=False).input_ids
        if return_tensors == "pt":
            import torch

            return torch.tensor([ids])
        return ids
'''


@pytest.fixture()
def chexagent_checkpoint(tmp_path):
    """Local trust_remote_code checkpoint whose custom classes implement
    CheXagent's interfaces (`models_loading_inference.py:55-61,485-513`:
    tokenizer.from_list_format + from/value apply_chat_template + causal-LM
    generate) — the real hub code is unreachable (no egress), so this
    executes the ADAPTER end-to-end against the same surface."""
    import json

    (tmp_path / "modeling_tiny_chexagent.py").write_text(CHEX_MODELING)
    (tmp_path / "tokenization_tiny_chexagent.py").write_text(CHEX_TOKENIZATION)

    tokenizer = _byte_tokenizer(["<|im_start|>", "<|im_end|>"])
    tokenizer.save_pretrained(tmp_path)
    cfg_path = tmp_path / "tokenizer_config.json"
    tok_cfg = json.loads(cfg_path.read_text())
    tok_cfg["auto_map"] = {
        "AutoTokenizer": [None, "tokenization_tiny_chexagent.TinyChexTokenizer"]
    }
    cfg_path.write_text(json.dumps(tok_cfg))

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "modeling_tiny_chexagent", tmp_path / "modeling_tiny_chexagent.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    cfg = mod.TinyChexConfig(
        vocab_size=len(tokenizer), hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, eos_token_id=tokenizer.eos_token_id,
    )
    cfg.auto_map = {
        "AutoConfig": "modeling_tiny_chexagent.TinyChexConfig",
        "AutoModelForCausalLM": "modeling_tiny_chexagent.TinyChexForCausalLM",
    }
    model = mod.TinyChexForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path)
    return str(tmp_path)


def test_chexagent_baseline_runs_real_inference(chexagent_checkpoint, cxr_png):
    from radvlm_tpu.eval.baselines import CheXagentBaseline, load_baseline

    b = load_baseline("chexagent", chexagent_checkpoint)
    assert isinstance(b, CheXagentBaseline)
    out = b.infer(cxr_png, "Provide a radiology report.", max_new_tokens=4)
    assert isinstance(out, str)
    # the grounding branch runs the box-token decode over the generation
    out2 = b.infer(cxr_png, "Locate the opacity.", max_new_tokens=4,
                   grounding=True)
    assert isinstance(out2, str)


MAIRA_PROCESSING = '''
import torch
from transformers import AutoTokenizer
from transformers.feature_extraction_utils import BatchFeature


class TinyMairaProcessor:
    """Interface stand-in for microsoft/maira-2's custom processor
    (format_and_preprocess_* builders, decode, grounded-sequence convert,
    box adjustment)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    @classmethod
    def from_pretrained(cls, path, **kw):
        return cls(AutoTokenizer.from_pretrained(path))

    @classmethod
    def register_for_auto_class(cls, auto_class="AutoProcessor"):
        pass  # ProcessorMixin API surface AutoProcessor invokes

    def _pack(self, text):
        ids = self.tokenizer(text, add_special_tokens=False).input_ids
        t = torch.tensor([ids])
        return BatchFeature({"input_ids": t,
                             "attention_mask": torch.ones_like(t)})

    def format_and_preprocess_reporting_input(
        self, current_frontal=None, current_lateral=None, prior_frontal=None,
        indication=None, technique=None, comparison=None, prior_report=None,
        return_tensors="pt", get_grounding=False,
    ):
        assert current_frontal is not None
        return self._pack("report for image " + str(current_frontal.size))

    def format_and_preprocess_phrase_grounding_input(
        self, frontal_image=None, phrase=None, return_tensors="pt",
    ):
        return self._pack("ground: " + str(phrase))

    def decode(self, ids, skip_special_tokens=True):
        return self.tokenizer.decode(ids,
                                     skip_special_tokens=skip_special_tokens)

    def convert_output_to_plaintext_or_grounded_sequence(self, decoded):
        if decoded.startswith("ground-marker"):  # never in random output
            return [("phrase", [(0.1, 0.2, 0.5, 0.6)])]
        return decoded

    def adjust_box_for_original_image_size(self, x1, y1, x2, y2,
                                           width=None, height=None):
        return (x1, y1, x2, y2)
'''


@pytest.fixture()
def maira2_checkpoint(tmp_path):
    """Local trust_remote_code checkpoint implementing MAIRA-2's processor +
    causal-LM interfaces (`models_loading_inference.py:79-89,118-178`)."""
    import json

    (tmp_path / "modeling_tiny_chexagent.py").write_text(CHEX_MODELING)
    (tmp_path / "processing_tiny_maira.py").write_text(MAIRA_PROCESSING)
    tokenizer = _byte_tokenizer([])
    tokenizer.save_pretrained(tmp_path)
    (tmp_path / "processor_config.json").write_text(json.dumps({
        "auto_map": {"AutoProcessor": "processing_tiny_maira.TinyMairaProcessor"},
        "processor_class": "TinyMairaProcessor",
    }))

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "modeling_tiny_chexagent2", tmp_path / "modeling_tiny_chexagent.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    cfg = mod.TinyChexConfig(
        vocab_size=len(tokenizer), hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, eos_token_id=tokenizer.eos_token_id,
    )
    cfg.auto_map = {
        "AutoConfig": "modeling_tiny_chexagent.TinyChexConfig",
        "AutoModelForCausalLM": "modeling_tiny_chexagent.TinyChexForCausalLM",
    }
    model = mod.TinyChexForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path)
    return str(tmp_path)


def test_maira2_baseline_runs_real_inference(maira2_checkpoint, cxr_png):
    from radvlm_tpu.eval.baselines import MAIRA2Baseline, load_baseline

    b = load_baseline("maira2", maira2_checkpoint)
    assert isinstance(b, MAIRA2Baseline)
    out = b.infer(cxr_png, "Provide a radiology report.", max_new_tokens=4)
    assert isinstance(out, str)
    # phrase grounding: generate -> convert -> (no boxes in random output)
    out2 = b.ground(cxr_png, "the opacity", max_new_tokens=4)
    assert isinstance(out2, str)


@pytest.fixture()
def llava_biovil_package():
    """Stand-in for the external LLAVA_Biovil package (RaDialog's loader,
    `models_loading_inference.py:23-48`): load_pretrained_model returns a
    real tiny LM whose generate accepts the `images=` kwarg."""
    import importlib.machinery

    from transformers import LlamaConfig, LlamaForCausalLM

    tokenizer = _byte_tokenizer(["<s>"])
    tokenizer.bos_token = "<s>"
    tokenizer.pad_token = tokenizer.eos_token
    torch.manual_seed(0)
    lm = LlamaForCausalLM(LlamaConfig(
        vocab_size=len(tokenizer), hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, eos_token_id=tokenizer.eos_token_id,
    ))
    lm.eval()

    class BiovilLlava:
        def generate(self, input_ids, images=None, **kw):
            assert images is not None and images.dtype == torch.bfloat16
            # the real model splices image features at the -200 sentinels
            # (llava_arch prepare_inputs; absent on multi-turn calls, same
            # as the reference `:205-235`); the stand-in LM just masks them
            input_ids = input_ids.clamp(min=0)
            kw.pop("do_sample", None)
            kw.pop("use_cache", None)
            with torch.no_grad():
                return lm.generate(input_ids, do_sample=False, **kw)

    def load_pretrained_model(model_path, model_base=None, model_name=None,
                              load_8bit=False, load_4bit=False,
                              device_map="cpu"):
        return tokenizer, BiovilLlava(), None, None

    created = []
    for name in ("LLAVA_Biovil", "LLAVA_Biovil.llava", "LLAVA_Biovil.llava.model"):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
        created.append(name)
    builder = types.ModuleType("LLAVA_Biovil.llava.model.builder")
    builder.load_pretrained_model = load_pretrained_model
    sys.modules["LLAVA_Biovil.llava.model.builder"] = builder
    created.append("LLAVA_Biovil.llava.model.builder")
    yield
    for name in created:
        sys.modules.pop(name, None)


def test_radialog_baseline_runs_real_inference(llava_biovil_package, cxr_png):
    from radvlm_tpu.eval.baselines import RaDialogBaseline, load_baseline

    b = load_baseline("radialog", "/fake/snapshot")
    assert isinstance(b, RaDialogBaseline)
    out = b.infer(cxr_png, "Provide a radiology report.", max_new_tokens=4)
    assert isinstance(out, str)
    out2 = b.infer(cxr_png, "And the heart?",
                   chat_history=[("Report?", "Normal.")], max_new_tokens=4)
    assert isinstance(out2, str)


def test_llavamed_baseline_runs_real_inference(llavamed_checkpoint, cxr_png):
    from radvlm_tpu.eval.baselines import LlavaMedBaseline, load_baseline

    b = load_baseline("llavamed", llavamed_checkpoint)
    assert isinstance(b, LlavaMedBaseline)
    out = b.infer(cxr_png, "Provide a radiology report.", max_new_tokens=4)
    assert isinstance(out, str)
    # multi-turn history renders through the mistral_instruct prompt builder
    out2 = b.infer(
        cxr_png, "And the heart?", chat_history=[("Report?", "Normal.")],
        max_new_tokens=4,
    )
    assert isinstance(out2, str)
