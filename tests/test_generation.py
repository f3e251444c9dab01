"""LlamaClient against the in-process fake llama.cpp backend."""
import pytest

from persian_rag_tpu.gen.client import LlamaClient
from persian_rag_tpu.gen.fake_server import FakeLlamaServer


def test_health_and_connection():
    with FakeLlamaServer() as url:
        client = LlamaClient(url)
        assert client.connected
        info = client.get_server_info()
        assert info["status"] == "connected"
        assert "/health" in info["endpoints"]


def test_completion_endpoint_generation():
    with FakeLlamaServer() as url:
        client = LlamaClient(url)
        prompt = client.create_rag_prompt(
            "دارو چه کاربردی دارد؟",
            ["دارو برای درمان بیماری استفاده می شود. قیمت آن بالاست."],
        )
        answer = client.generate(prompt, max_tokens=64)
        assert answer
        assert "درمان" in answer


def test_fallback_to_chat_endpoints():
    # completion disabled -> client must fall through to /v1/chat/completions
    with FakeLlamaServer(
        enabled={"health", "chat_openai", "models"}
    ) as url:
        client = LlamaClient(url)
        answer = client.answer_question(
            "دارو چه کاربردی دارد؟",
            ["دارو برای درمان بیماری استفاده می شود."],
        )
        assert answer and "درمان" in answer
    # only the bare /chat endpoint available
    with FakeLlamaServer(enabled={"health", "chat_simple"}) as url:
        client = LlamaClient(url)
        answer = client.answer_question(
            "دارو چه کاربردی دارد؟",
            ["دارو برای درمان بیماری استفاده می شود."],
        )
        assert answer and "درمان" in answer


def test_no_server_returns_none():
    client = LlamaClient("http://127.0.0.1:1")  # nothing listens here
    assert not client.connected
    assert client.generate("hi") is None


def test_clean_prediction_strips_artifacts():
    client = LlamaClient.__new__(LlamaClient)  # no connection probe
    assert "hello" not in client.clean_prediction("<|eot_id|>")
    cleaned = client.clean_prediction(
        "پاسخ: دارو برای درمان بیماری های قلبی استفاده می شود."
    )
    assert "پاسخ:" not in cleaned
    assert "درمان" in cleaned
    # 15-word cap for overlong single sentences
    long_text = " ".join(f"word{i}" for i in range(40))
    assert len(client.clean_prediction(long_text).split()) <= 15


def test_rag_prompt_structure_and_budget():
    client = LlamaClient.__new__(LlamaClient)
    contexts = ["متن اول " * 50, "متن دوم " * 50, "متن سوم " * 500]
    prompt = client.create_rag_prompt("سوال من؟", contexts, max_context_length=500)
    assert "بر اساس اطلاعات زیر" in prompt
    assert "متن 1:" in prompt
    assert "سوال: سوال من؟" in prompt
    assert "متن 3:" not in prompt  # budget cut


def test_batch_answer():
    with FakeLlamaServer() as url:
        client = LlamaClient(url)
        answers = client.batch_answer(
            [
                {"question": "دارو چیست؟", "contexts": ["دارو ماده درمانی است."]},
                {"question": "قلب چیست؟", "contexts": ["قلب عضو پمپاژ خون است."]},
            ]
        )
        assert len(answers) == 2
        assert all(a for a in answers)
