"""Streaming chat example (cf. kjarni-examples/examples/llama.rs)."""

from kjarni_tpu import Chat

chat = Chat("qwen2.5-0.5b-instruct", system_prompt="You are terse.")
for st in chat.stream("What is the capital of Iceland?"):
    print(st.text, end="", flush=True)
print()
