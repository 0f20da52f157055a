"""HTTP-backed model providers for the ST3/ST6 seams.

Reproduces the reference's LLM-client contract
(src/parsers/llm_client.py:404-478 request/retry semantics,
:480-548 markdown-fence stripping + truncated-JSON repair,
:100-152 analyze_header result shape) behind this engine's
``config.ColumnModel`` / ``config.TitleModel`` interfaces. The
deterministic rule models remain the default provider everywhere —
this module is what a user slots in to get model-assisted analysis,
exactly like the reference's provider plugins (llm_client.py:14-19).

Transport is injectable so every behavior is unit-testable with canned
responses (no network in this sandbox); the default transport is
stdlib urllib. Three wire styles cover the reference's provider list:

- ``messages``: api-key header, separate system prompt,
  ``data['content'][0]['text']`` (Anthropic-style APIs)
- ``chat``: Bearer auth, system+user message list,
  ``data['choices'][0]['message']['content']`` (OpenAI-compatible)
- ``generate``: single concatenated prompt, ``data['response']``
  (Ollama-style local servers)

Retry semantics mirror the reference: timeouts and transport faults
retry up to ``max_retries``; an HTTP status error fails immediately
(llm_client.py:443-466).
"""
from __future__ import annotations

import json
from typing import Any, Callable, Optional

from .config import ColumnModel, TitleModel
from .patterns import COL_CURRENT, COL_ITEM_NAME, COL_NOTE, COL_PREVIOUS

Transport = Callable[[str, dict[str, str], dict[str, Any], float], tuple[int, str]]


class RequestTimeout(Exception):
    """Transport-level timeout (retryable)."""


class HttpStatusError(Exception):
    """Non-2xx HTTP response (NOT retried, mirroring the reference)."""

    def __init__(self, status: int, message: str = "") -> None:
        super().__init__(message or f"HTTP {status}")
        self.status = status


def _urllib_transport(url: str, headers: dict[str, str],
                      payload: dict[str, Any], timeout: float) -> tuple[int, str]:
    import socket
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        raise HttpStatusError(e.code, str(e)) from e
    except urllib.error.URLError as e:
        if isinstance(e.reason, (socket.timeout, TimeoutError)):
            raise RequestTimeout(str(e)) from e
        raise
    except socket.timeout as e:
        raise RequestTimeout(str(e)) from e


# ---------------------------------------------------------------------------
# response repair / parsing (llm_client.py:480-548 semantics)
# ---------------------------------------------------------------------------

def strip_markdown_fence(content: str) -> str:
    content = content.strip()
    if content.startswith("```json"):
        content = content[7:]
    elif content.startswith("```"):
        content = content[3:]
    if content.endswith("```"):
        content = content[:-3]
    return content.strip()


def repair_truncated_object(content: str) -> str:
    """Best-effort completion of a truncated JSON object: models cut
    off mid-''reasoning'' are closed; a dangling ''confidence'' gets a
    stand-in reasoning; anything else just gets the closing brace."""
    if content.endswith("}"):
        return content
    if '"reasoning"' in content:
        content = content.rstrip(",\n ")
        if not content.endswith("}"):
            # an unterminated string value needs its quote first
            if content.count('"') % 2 == 1:
                content += '"'
            content += "\n}"
    elif '"confidence"' in content:
        content = content.rstrip(",\n ")
        if not content.endswith("}"):
            content += ',\n  "reasoning": "Response truncated"\n}'
    else:
        content += "\n}"
    return content


def repair_truncated_array(content: str) -> str:
    """Array variant for the title-classification contract: trim back
    to the last complete element and close the bracket."""
    if content.endswith("]"):
        return content
    last = content.rfind("}")
    if last >= 0:
        return content[:last + 1] + "]"
    return content.rstrip(",\n ") + "]"


def parse_column_response(content: str) -> dict[str, Any]:
    """Parse an analyze-header completion into the reference's result
    shape; column indices are coerced to int and invalid entries
    dropped so downstream arbitration always sees a clean map."""
    content = repair_truncated_object(strip_markdown_fence(content))
    try:
        result = json.loads(content)
    except json.JSONDecodeError as e:
        return {"success": False, "error": f"JSON parse error: {e}",
                "column_map": {}, "confidence": 0.0, "raw_response": content}
    raw_map = result.get("column_map", {}) or {}
    column_map = {}
    for key, idx in raw_map.items():
        try:
            column_map[str(key)] = int(idx)
        except (TypeError, ValueError):
            continue
    return {"success": True, "column_map": column_map,
            "confidence": float(result.get("confidence", 0.0) or 0.0),
            "reasoning": str(result.get("reasoning", "")),
            "raw_response": content}


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

_STYLE_ALIASES = {
    "anthropic": "messages",
    "openrouter": "chat",
    "chaitin": "chat",
    "custom": "chat",
    "ollama": "generate",
}

# protocol version for the "messages" wire format — the PUBLIC,
# documented header value of a public commercial API (the reference
# ships the same provider option in its template config); requests
# without it are rejected with HTTP 400
_MESSAGES_API_VERSION = "2023-06-01"

_COLUMN_SYSTEM_PROMPT = (
    "You label the columns of a financial-statement header row. "
    "Column types: item_name, current_period, previous_period, note. "
    "Answer with JSON only."
)

_TITLE_SYSTEM_PROMPT = (
    "You detect note-section titles in annual-report text lines. "
    "Answer with a JSON array only."
)


class HttpModelClient:
    """Provider-pluggable HTTP completion client.

    ``config`` keys (same vocabulary as the reference's
    llm_config.template.json): provider, base_url, model, api_key,
    max_tokens, temperature, timeout, max_retries, default_headers.
    """

    def __init__(self, config: dict[str, Any],
                 transport: Optional[Transport] = None) -> None:
        self.style = _STYLE_ALIASES.get(
            str(config.get("provider", "custom")).lower(),
            str(config.get("provider", "chat")).lower())
        self.base_url = (config.get("base_url") or "").rstrip("/")
        self.model = config.get("model", "")
        self.api_key = config.get("api_key")
        self.max_tokens = int(config.get("max_tokens", 1024))
        self.temperature = float(config.get("temperature", 0.0))
        self.timeout = float(config.get("timeout", 30))
        self.max_retries = int(config.get("max_retries", 3))
        self.default_headers = dict(config.get("default_headers", {}))
        self.transport = transport or _urllib_transport

    # -- wire formats -----------------------------------------------------

    def _build_request(self, user_prompt: str, system_prompt: str):
        if self.style == "messages":
            url = f"{self.base_url}/v1/messages"
            headers = {"x-api-key": self.api_key or "",
                       "content-type": "application/json",
                       "anthropic-version": _MESSAGES_API_VERSION,
                       **self.default_headers}
            payload = {"model": self.model, "max_tokens": self.max_tokens,
                       "temperature": self.temperature, "system": system_prompt,
                       "messages": [{"role": "user", "content": user_prompt}]}
        elif self.style == "generate":
            url = f"{self.base_url}/api/generate"
            headers = {"content-type": "application/json", **self.default_headers}
            payload = {"model": self.model,
                       "prompt": f"{system_prompt}\n\n{user_prompt}",
                       "stream": False,
                       "options": {"temperature": self.temperature,
                                   "num_predict": self.max_tokens}}
        else:  # chat (OpenAI-compatible), the reference's default
            url = f"{self.base_url}/v1/chat/completions"
            headers = {"authorization": f"Bearer {self.api_key or ''}",
                       "content-type": "application/json",
                       **self.default_headers}
            payload = {"model": self.model, "max_tokens": self.max_tokens,
                       "temperature": self.temperature,
                       "messages": [{"role": "system", "content": system_prompt},
                                    {"role": "user", "content": user_prompt}]}
        return url, headers, payload

    def _extract_content(self, data: dict[str, Any]) -> str:
        if self.style == "messages":
            return data["content"][0]["text"]
        if self.style == "generate":
            return data["response"]
        return data["choices"][0]["message"]["content"]

    # -- request loop (llm_client.py:404-478 semantics) -------------------

    def _make_request(self, url, headers, payload) -> dict[str, Any]:
        last_error = "max retries exceeded"
        # max_retries counts RETRIES: always one attempt, plus up to
        # max_retries more on retryable faults (max_retries=0 still
        # issues the request once)
        for _ in range(self.max_retries + 1):
            try:
                status, body = self.transport(url, headers, payload, self.timeout)
                return {"success": True, "data": json.loads(body), "status": status}
            except RequestTimeout:
                last_error = f"request timeout after {self.timeout}s"
            except HttpStatusError as e:
                return {"success": False, "error": f"HTTP error: {e.status}"}
            except Exception as e:  # transport fault: retryable
                last_error = str(e)
        return {"success": False, "error": last_error}

    def complete(self, user_prompt: str,
                 system_prompt: str = "") -> dict[str, Any]:
        """Generic completion: {'success', 'content' | 'error'}."""
        if not self.api_key and self.style != "generate":
            return {"success": False, "error": "API key not set", "content": ""}
        url, headers, payload = self._build_request(user_prompt, system_prompt)
        resp = self._make_request(url, headers, payload)
        if not resp["success"]:
            return {"success": False, "error": resp["error"], "content": ""}
        try:
            return {"success": True, "content": self._extract_content(resp["data"])}
        except (KeyError, IndexError, TypeError) as e:
            return {"success": False,
                    "error": f"malformed provider response: {e}", "content": ""}


class HttpColumnModel(ColumnModel):
    """ST6 provider: header analysis over HTTP with the reference's
    analyze_header contract (success/column_map/confidence/reasoning)."""

    def __init__(self, config: dict[str, Any],
                 transport: Optional[Transport] = None) -> None:
        self.client = HttpModelClient(config, transport=transport)

    @staticmethod
    def _user_prompt(header_row: list[str]) -> str:
        return (
            "Header row ("
            f"{len(header_row)} columns):\n"
            f"{json.dumps(header_row, ensure_ascii=False)}\n"
            "Return JSON only: {\"column_map\": {"
            f"\"{COL_ITEM_NAME}\": idx, \"{COL_CURRENT}\": idx, "
            f"\"{COL_PREVIOUS}\": idx, \"{COL_NOTE}\": idx"
            "}, \"confidence\": 0.0-1.0, \"reasoning\": \"...\"}. "
            "Indices are 0-based; omit absent column types."
        )

    def analyze_header(self, row: list[str]) -> dict[str, Any]:
        resp = self.client.complete(self._user_prompt(row), _COLUMN_SYSTEM_PROMPT)
        if not resp["success"]:
            return {"success": False, "error": resp["error"],
                    "column_map": {}, "confidence": 0.0}
        return parse_column_response(resp["content"])


class HttpTitleModel(TitleModel):
    """ST3 provider: note-title classification over HTTP. Expects a
    JSON array of {level, number, title, full_title, offset}; truncated
    arrays are trimmed to the last complete element. Any failure
    degrades to the deterministic rule model (the seam's contract —
    workers must never stall on a provider)."""

    def __init__(self, config: dict[str, Any],
                 transport: Optional[Transport] = None) -> None:
        self.client = HttpModelClient(config, transport=transport)

    def classify_lines(self, lines: list[tuple[str, int]]) -> list[dict[str, Any]]:
        prompt = (
            "Lines as [text, offset] pairs:\n"
            f"{json.dumps(lines, ensure_ascii=False)}\n"
            "Return a JSON array of objects {\"level\": int, \"number\": str, "
            "\"title\": str, \"full_title\": str, \"offset\": int} for lines "
            "that are note-section titles; [] if none."
        )
        resp = self.client.complete(prompt, _TITLE_SYSTEM_PROMPT)
        if not resp["success"]:
            return super().classify_lines(lines)
        content = repair_truncated_array(strip_markdown_fence(resp["content"]))
        try:
            parsed = json.loads(content)
            if not isinstance(parsed, list):
                raise ValueError("expected array")
        except (json.JSONDecodeError, ValueError):
            return super().classify_lines(lines)
        out = []
        for item in parsed:
            if not isinstance(item, dict):
                continue
            try:
                out.append({"level": int(item["level"]),
                            "number": str(item["number"]),
                            "title": str(item["title"]),
                            "full_title": str(item.get("full_title", item["title"])),
                            "offset": int(item["offset"])})
            except (KeyError, TypeError, ValueError):
                continue
        return out
