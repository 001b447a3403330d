"""Continuous-batching serving example.

Start a server where concurrent /v1/generate requests join a running
slot-based decode mid-flight (token-level batching, vLLM-style):

    kjarni serve --scheduler continuous --max-batch 8 \
        --models generate=qwen2.5-0.5b-instruct

Or drive the engine directly:
"""

from kjarni_tpu.generate.continuous import ContinuousEngine
from kjarni_tpu.generate.sampling import SamplingParams
from kjarni_tpu.models.decoder_lm import DecoderLM
from kjarni_tpu.tasks.common import resolve_model_dir


def main():
    model_dir, _ = resolve_model_dir("qwen2.5-0.5b-instruct")
    lm = DecoderLM(model_dir, max_context=2048)
    eng = ContinuousEngine(lm, slots=8, no_repeat_ngram_size=3)

    # greedy, sampled, and penalized requests share every decode dispatch
    eng.submit("The capital of Iceland is", max_new_tokens=32)
    eng.submit("Write a haiku about TPUs.", max_new_tokens=48,
               sampling=SamplingParams(temperature=0.8, top_p=0.95), seed=7)
    eng.submit("List three fjords:", max_new_tokens=48,
               repetition_penalty=1.2, no_repeat_ngram=True)

    for _ in range(4):            # ...and more can join mid-decode
        eng.step()
    eng.submit("Late joiner:", max_new_tokens=16)

    for fr in eng.run():
        print(f"[{fr.request_id}] ({fr.finish_reason}) {fr.text}")

    # Prompt caching across slots: register a shared system prompt (or let
    # the engine auto-detect one — two prompts sharing >=32 leading tokens
    # trigger it) and admissions compute only the per-request suffix.
    system = "You are a concise assistant. Answer in one sentence.\n\n"
    eng.register_prefix(system)
    eng.submit(system + "Why is the sky blue?", max_new_tokens=32)
    eng.submit(system + "Name a prime above 100.", max_new_tokens=16)
    for fr in eng.run():
        print(f"[{fr.request_id}] {fr.text}")
    print("engine stats:", eng.stats)   # incl. prefix_hits


if __name__ == "__main__":
    main()
