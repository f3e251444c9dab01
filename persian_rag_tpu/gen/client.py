"""HTTP client for a llama.cpp-style generation server.

Behavior-compatible with the reference's LlamaClient (reference:
src/llama_client.py): health probing via /health then /v1/models
(:20-30), generation with the /completion -> /v1/chat/completions ->
/chat endpoint fallback chain (:92-99, :108-175), the same Persian stop
lists, the same aggressive prediction cleaning (:32-76), the same Persian
RAG prompt template (:177-202) and answer post-processing (:204-247).

Generation runs in an external process (llama.cpp or the in-process fake
backend in persian_rag_tpu.gen.fake_server); it is deliberately outside
the TPU retrieval core.
"""
from __future__ import annotations

import re
import time
from typing import Dict, List, Optional

import requests

DEFAULT_STOP = ["</s>", "<|eot_id|>", "\n\nسوال:", "\n\nپرسش:", "Human:", "user:"]

RAG_STOP = [
    "</s>", "<|eot_id|>", "\n\nسوال:", "\n\nپرسش:",
    "\n\nQuestion:", "Human:", "user:", "\n\nمتن",
    "اطلاعات مرجع:", "بر اساس",
]

_PROMPT_PREFIXES = [
    r"بر اساس اطلاعات ارائه شده[،:]?\s*",
    r"با توجه به متن[،:]?\s*",
    r"طبق اطلاعات[،:]?\s*",
    r"پاسخ[:\s]*",
]

_RAG_ANSWER_PREFIXES = ["کوتاه و مستقیم:", "مستقیم:", "کوتاه:", "دقیق:"]


class LlamaClient:
    def __init__(self, base_url: str = "http://127.0.0.1:8080", timeout: int = 120):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.session = requests.Session()
        self.connected = self._test_connection()

    def _test_connection(self) -> bool:
        try:
            r = self.session.get(f"{self.base_url}/health", timeout=5)
            return r.status_code == 200
        except Exception:
            try:
                r = self.session.get(f"{self.base_url}/v1/models", timeout=5)
                return r.status_code in (200, 404)
            except Exception:
                return False

    # -- response cleaning ----------------------------------------------------

    def clean_prediction(self, text: str) -> str:
        if not text:
            return ""
        text = re.sub(r"<\|[^|]*\|>", "", text)
        text = re.sub(r"user[a-zA-Z]*", "", text)
        text = re.sub(r"assistant[a-zA-Z]*", "", text)
        text = re.sub(r"<[^>]*>", "", text)
        text = re.sub(r"system[:\s]*", "", text, flags=re.IGNORECASE)
        text = re.sub(r"human[:\s]*", "", text, flags=re.IGNORECASE)
        text = re.sub(r"ai[:\s]*", "", text, flags=re.IGNORECASE)
        for pattern in _PROMPT_PREFIXES:
            text = re.sub(pattern, "", text)
        text = re.sub(r"\s+", " ", text).strip()
        text = re.sub(r"\s+\.\.\.$", "", text)
        sentences = [s.strip() for s in text.split(".") if s.strip()]
        if sentences:
            best = max(
                sentences, key=lambda s: len(s) if len(s.split()) > 2 else 0
            )
            if len(best) > 10:
                text = best
            else:
                text = sentences[0]
        if len(text) > 100:
            words = text.split()
            if len(words) > 15:
                text = " ".join(words[:15])
        return text.strip()

    # -- endpoints -------------------------------------------------------------

    def _try_completion(self, payload: Dict) -> Optional[str]:
        try:
            r = self.session.post(
                f"{self.base_url}/completion",
                json=payload,
                timeout=self.timeout,
                headers={"Content-Type": "application/json"},
            )
            if r.status_code == 200:
                data = r.json()
                if "content" in data:
                    return data["content"].strip()
                if data.get("choices"):
                    return data["choices"][0]["text"].strip()
        except Exception:
            pass
        return None

    def _try_chat(self, prompt: str, payload: Dict) -> Optional[str]:
        chat_payload = {
            "messages": [{"role": "user", "content": prompt}],
            "max_tokens": payload.get("max_tokens", 512),
            "temperature": payload.get("temperature", 0.1),
            "top_p": payload.get("top_p", 0.9),
            "stream": False,
        }
        try:
            r = self.session.post(
                f"{self.base_url}/v1/chat/completions",
                json=chat_payload,
                timeout=self.timeout,
                headers={"Content-Type": "application/json"},
            )
            if r.status_code == 200:
                data = r.json()
                if data.get("choices"):
                    return data["choices"][0]["message"]["content"].strip()
        except Exception:
            pass
        try:
            r = self.session.post(
                f"{self.base_url}/chat",
                json=chat_payload,
                timeout=self.timeout,
                headers={"Content-Type": "application/json"},
            )
            if r.status_code == 200:
                data = r.json()
                if "content" in data:
                    return data["content"].strip()
                if "response" in data:
                    return data["response"].strip()
        except Exception:
            pass
        return None

    def generate(
        self,
        prompt: str,
        max_tokens: int = 512,
        temperature: float = 0.1,
        top_p: float = 0.9,
        stop: Optional[List[str]] = None,
    ) -> Optional[str]:
        payload = {
            "prompt": prompt,
            "max_tokens": max_tokens,
            "temperature": temperature,
            "top_p": top_p,
            "stream": False,
            "stop": stop or list(DEFAULT_STOP),
        }
        response = self._try_completion(payload)
        if response:
            return self.clean_prediction(response)
        response = self._try_chat(prompt, payload)
        if response:
            return self.clean_prediction(response)
        return None

    # -- RAG prompt ---------------------------------------------------------------

    def create_rag_prompt(
        self, question: str, contexts: List[str], max_context_length: int = 2000
    ) -> str:
        combined = ""
        length = 0
        for i, context in enumerate(contexts):
            block = f"متن {i + 1}: {context}\n\n"
            if length + len(block) > max_context_length:
                break
            combined += block
            length += len(block)
        return (
            "بر اساس اطلاعات زیر، به سوال پاسخ کوتاه و دقیق دهید.\n\n"
            "اطلاعات مرجع:\n"
            f"{combined.strip()}\n\n"
            f"سوال: {question}\n\n"
            "پاسخ کوتاه و مستقیم:"
        )

    def answer_question(
        self,
        question: str,
        contexts: List[str],
        max_tokens: int = 128,
        temperature: float = 0.05,
    ) -> Optional[str]:
        prompt = self.create_rag_prompt(question, contexts)
        response = self.generate(
            prompt=prompt,
            max_tokens=max_tokens,
            temperature=temperature,
            top_p=0.85,
            stop=list(RAG_STOP),
        )
        if not response:
            return None
        response = response.strip()
        if "پاسخ" in response and ":" in response:
            parts = response.split(":")
            if len(parts) > 1:
                response = ":".join(parts[1:]).strip()
        for prefix in _RAG_ANSWER_PREFIXES:
            if response.startswith(prefix):
                response = response[len(prefix):].strip()
        return response

    def batch_answer(
        self,
        questions_contexts: List[Dict],
        max_tokens: int = 128,
        temperature: float = 0.05,
        delay_between_requests: float = 0.0,
    ) -> List[Optional[str]]:
        answers = []
        for item in questions_contexts:
            answers.append(
                self.answer_question(
                    item["question"],
                    item["contexts"],
                    max_tokens=max_tokens,
                    temperature=temperature,
                )
            )
            if delay_between_requests > 0:
                time.sleep(delay_between_requests)
        return answers

    def get_server_info(self) -> Dict:
        info: Dict = {"status": "unknown", "base_url": self.base_url, "endpoints": []}
        for endpoint in (
            "/health",
            "/v1/models",
            "/completion",
            "/chat",
            "/v1/chat/completions",
        ):
            try:
                r = self.session.get(f"{self.base_url}{endpoint}", timeout=5)
                if r.status_code in (200, 405):
                    info["endpoints"].append(endpoint)
            except Exception:
                pass
        info["status"] = "connected" if info["endpoints"] else "disconnected"
        return info

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.session.close()
