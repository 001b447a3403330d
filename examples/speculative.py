"""Speculative decoding example: small draft accelerates a larger target."""

from kjarni_tpu.generate.sampling import GenerationConfig
from kjarni_tpu.generate.speculative import SpeculativeGenerator
from kjarni_tpu.models.decoder_lm import DecoderLM
from kjarni_tpu.tasks.common import resolve_model_dir

target_dir, _ = resolve_model_dir("llama3.2-3b-instruct")
draft_dir, _ = resolve_model_dir("llama3.2-1b-instruct")
spec = SpeculativeGenerator(DecoderLM(target_dir), DecoderLM(draft_dir),
                            num_tokens=4)
print(spec.generate("The three laws of robotics are",
                    config=GenerationConfig.greedy(max_new_tokens=64)))
