"""Speculative decoding through the product surface.

The generator owns the draft model (cf. the reference's DecoderGenerator
loading its draft internally) — every caller gets speculative decoding by
passing draft_model:
"""

from kjarni_tpu.tasks.generator import Generator

gen = Generator("llama-3.2-3b-instruct",
                draft_model="llama-3.2-1b-instruct",  # same vocabulary
                draft_num_tokens=4)
text = gen.generate("The three laws of robotics are", max_new_tokens=64)
print(text)
spec = gen.speculative
print(f"[draft acceptance: {spec.last_acceptance_rate:.0%} "
      f"({spec.last_accepted}/{spec.last_drafted} over {spec.last_rounds} "
      f"rounds)]")

# CLI equivalents:
#   kjarni generate "..." --model llama-3.2-3b-instruct \
#       --draft-model llama-3.2-1b-instruct
#   kjarni serve --draft-model llama-3.2-1b-instruct
