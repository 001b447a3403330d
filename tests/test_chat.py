"""Chat/Generator task tests + chat template formats (cf. chat/*.rs tests)."""

import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model

from kjarni_tpu.chat_templates import (ChatMLTemplate, Conversation,
                                       Llama2ChatTemplate, Llama3ChatTemplate,
                                       MistralChatTemplate, Message,
                                       Phi3ChatTemplate, RawTemplate)
from kjarni_tpu.tasks.chat import Chat
from kjarni_tpu.tasks.generator import Generator, resolve_generation_config


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM
    d = tmp_path_factory.mktemp("llama_chat")
    vocab_map = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vocab_map), hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(11)
    model = LlamaForCausalLM(config).eval()
    save_torch_model(d, model, config)
    return d


class TestTemplates:
    def test_llama3_format(self):
        t = Llama3ChatTemplate()
        conv = Conversation([Message.user("Hello")])
        p = t.apply(conv)
        assert p.startswith("<|begin_of_text|>")
        assert "<|start_header_id|>user<|end_header_id|>\n\nHello<|eot_id|>" in p
        assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")

    def test_chatml_format(self):
        t = ChatMLTemplate()
        conv = Conversation([Message.system("sys"), Message.user("hi")])
        p = t.apply(conv)
        assert p == ("<|im_start|>system\nsys<|im_end|>\n"
                     "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n")

    def test_mistral_single_user(self):
        t = MistralChatTemplate()
        p = t.apply(Conversation([Message.user("Hello there")]))
        assert p == "<s>[INST] Hello there [/INST]"

    def test_mistral_with_system(self):
        t = MistralChatTemplate()
        conv = Conversation([Message.system("You are a helpful assistant."),
                             Message.user("What is 2 + 2?")])
        assert t.apply(conv) == \
            "<s>[INST] You are a helpful assistant.\n\nWhat is 2 + 2? [/INST]"

    def test_mistral_multi_turn(self):
        t = MistralChatTemplate()
        conv = Conversation([Message.system("Assistant is friendly."),
                             Message.user("Hello!"),
                             Message.assistant("Hi there!"),
                             Message.user("How are you?"),
                             Message.assistant("I'm good, thank you!")])
        assert t.apply(conv) == ("<s>[INST] Assistant is friendly.\n\nHello! [/INST]"
                                 " Hi there!</s>[INST] How are you? [/INST]"
                                 " I'm good, thank you!</s>")

    def test_llama2_empty_conversation(self):
        # cf. llama3.rs:424 llama2_empty_conversation
        assert Llama2ChatTemplate().apply(Conversation()) == ""

    def test_llama2_single_user_with_system(self):
        # cf. llama3.rs llama2_single_user_message_with_system
        t = Llama2ChatTemplate()
        conv = Conversation([Message.system("You are helpful."),
                             Message.user("Hello!")])
        assert t.apply(conv) == ("<s>[INST] <<SYS>>\nYou are helpful.\n"
                                 "<</SYS>>\n\nHello! [/INST]")

    def test_llama2_multi_turn(self):
        # cf. llama3.rs llama2_multi_turn: each turn is its own <s>[INST]
        # block and each assistant reply closes with </s>
        t = Llama2ChatTemplate()
        conv = Conversation([Message.user("Hi"),
                             Message.assistant("Hello!"),
                             Message.user("How are you?"),
                             Message.assistant("I am fine.")])
        p = t.apply(conv)
        assert p == ("<s>[INST] Hi [/INST] Hello! </s>"
                     "<s>[INST] How are you? [/INST] I am fine. </s>")
        assert p.count("[/INST]") == 2 and p.count("</s>") == 2

    def test_llama2_mid_conversation_system_ignored(self):
        t = Llama2ChatTemplate()
        conv = Conversation([Message.user("Hi"),
                             Message.system("late system"),
                             Message.user("again")])
        assert "late system" not in t.apply(conv)

    def test_llama2_stops_and_default_system(self):
        t = Llama2ChatTemplate()
        assert t.stop_sequences() == ["</s>"]
        assert t.default_system_prompt() == \
            "You are a helpful, respectful and honest assistant."

    def test_phi3_format(self):
        t = Phi3ChatTemplate()
        p = t.apply(Conversation([Message.user("hi")]))
        assert p == "<|user|>\nhi<|end|>\n<|assistant|>\n"

    def test_raw_template(self):
        t = RawTemplate()
        assert t.apply(Conversation([Message.user("a"), Message.assistant("b")])) \
            == "a\nb"

    def test_conversation_helpers(self):
        c = Conversation.with_system("sys")
        c.push_user("u1")
        c.push_assistant("a1")
        assert c.system_prompt == "sys"
        assert c.turn_count() == 2
        c.clear(keep_system=True)
        assert len(c) == 1 and c.system_prompt == "sys"
        c.clear(keep_system=False)
        assert len(c) == 0


class TestChatTask:
    def test_send_appends_history(self, llama_dir):
        chat = Chat(str(llama_dir), system_prompt="be brief", max_context=64)
        reply = chat.send("hello world", preset="greedy", max_new_tokens=4,
                          max_length=64)
        assert isinstance(reply, str)
        msgs = chat.conversation.messages
        assert msgs[0].role.value == "system"
        assert msgs[1].role.value == "user" and msgs[1].content == "hello world"
        assert msgs[2].role.value == "assistant"

    def test_multi_turn_grows_history(self, llama_dir):
        chat = Chat(str(llama_dir), system_prompt=None, max_context=64)
        chat.send("hello", preset="greedy", max_new_tokens=2, max_length=64)
        chat.send("world", preset="greedy", max_new_tokens=2, max_length=64)
        assert chat.conversation.turn_count() == 4

    def test_clear_history(self, llama_dir):
        chat = Chat(str(llama_dir), system_prompt="s", max_context=64)
        chat.send("hello", preset="greedy", max_new_tokens=2, max_length=64)
        chat.clear_history()
        assert len(chat.conversation) == 1


class TestGeneratorTask:
    def test_generate(self, llama_dir):
        g = Generator(str(llama_dir), max_context=64)
        out = g.generate("hello world", preset="greedy", max_new_tokens=4,
                         max_length=64)
        assert isinstance(out, str)

    def test_presets_resolution(self):
        cfg = resolve_generation_config("greedy", max_new_tokens=7)
        assert cfg.strategy == "greedy" and cfg.max_new_tokens == 7
        cfg2 = resolve_generation_config("creative")
        assert cfg2.sampling.temperature == 1.0


class TestConversationKvReuse:
    def test_multi_turn_reuses_prefix_and_matches_fresh(self, llama_dir):
        from kjarni_tpu.models.decoder_lm import DecoderLM
        cfg_kwargs = dict(preset="greedy", max_new_tokens=4, max_length=64)

        chat_a = Chat(str(llama_dir), system_prompt="be brief", max_context=128)
        r1 = chat_a.send("hello world", **cfg_kwargs)
        first_prefill = chat_a.lm.last_prefill_tokens
        r2 = chat_a.send("the doctor", **cfg_kwargs)
        second_prefill = chat_a.lm.last_prefill_tokens
        # turn 2 re-sends the whole conversation but only prefills the delta
        full_len = len(chat_a.lm.tokenizer.encode(
            chat_a.lm.apply_chat_template(chat_a.conversation),
            add_special_tokens=False))
        assert second_prefill < full_len

        # a fresh chat must produce the same replies (reuse is lossless)
        chat_b = Chat(str(llama_dir), system_prompt="be brief", max_context=128)
        chat_b.lm._min_reuse_prefix = 10**9  # disable reuse
        assert chat_b.send("hello world", **cfg_kwargs) == r1
        assert chat_b.send("the doctor", **cfg_kwargs) == r2

    def test_diverging_prompt_invalidates_prefix(self, llama_dir):
        from kjarni_tpu.generate.sampling import GenerationConfig
        from kjarni_tpu.models.decoder_lm import DecoderLM
        lm = DecoderLM(llama_dir, max_context=64)
        cfg = GenerationConfig.greedy(max_new_tokens=4, max_length=64)
        a = lm.generate("hello world the doctor and the", config=cfg)
        # different prompt with a long shared prefix but divergent tail
        b = lm.generate("hello world the doctor and a", config=cfg)
        lm2 = DecoderLM(llama_dir, max_context=64)
        assert lm2.generate("hello world the doctor and a", config=cfg) == b


class TestChatContextTrimming:
    """A conversation exceeding max_context drops its OLDEST turns; the
    system prompt and the newest user message always survive into the
    prompt actually prefilled (VERDICT r2 item 3)."""

    def test_latest_message_survives(self, llama_dir):
        chat = Chat(str(llama_dir), system_prompt="be brief", max_context=48)
        kw = dict(preset="greedy", max_new_tokens=2, max_length=10_000)
        for i in range(6):
            chat.send("the doctor and the physician went to work", **kw)
        final = "keeping data safe"
        chat.send(final, **kw)
        # the ids actually materialized in the cache = trimmed prompt + reply
        prefilled = chat.lm.tokenizer.decode(chat.lm._session_ids)
        assert final in prefilled
        # system prompt survived the trim
        assert chat.conversation.system_prompt == "be brief"
        # and old turns were actually dropped
        assert chat.conversation.turn_count() < 14

    def test_drop_oldest_turn_semantics(self):
        from kjarni_tpu.chat_templates import Conversation
        c = Conversation.with_system("sys")
        c.push_user("u1"); c.push_assistant("a1")
        c.push_user("u2"); c.push_assistant("a2")
        c.push_user("u3")
        assert c.drop_oldest_turn()
        contents = [m.content for m in c.messages]
        assert contents == ["sys", "u2", "a2", "u3"]
        assert c.drop_oldest_turn()
        assert [m.content for m in c.messages] == ["sys", "u3"]
        # the newest message is never dropped
        assert not c.drop_oldest_turn()
        assert [m.content for m in c.messages] == ["sys", "u3"]
