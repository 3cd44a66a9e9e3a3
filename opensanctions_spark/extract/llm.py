"""Compat ``zavod.extract.llm`` (``zavod/zavod/extract/llm.py``): the
driver-side LLM prompt surface. The model call is the registered
text-prompt runner (``shed.trans.register_text_prompt_runner`` — one
seam for every driver-side LLM need); the DataFrame-scale twin with
cache-join batching is ``sources/llm.py`` (S11). Unconfigured →
ConfigurationException, the reference's failure type, which callers
like ``shed.trans.run_translation_prompt`` catch and degrade on.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Any

from opensanctions_spark.crawler import CrawlerContext

DEFAULT_MODEL = "llm"


class ConfigurationException(RuntimeError):
    def __init__(self, message: str) -> None:
        super().__init__(message)
        self.message = message


@dataclass
class TextPromptResponse:
    content: str
    cache_key: str


def _runner():
    from opensanctions_spark.shed import trans

    if trans._TEXT_PROMPT_RUNNER is None:
        raise ConfigurationException(
            "No text-prompt runner registered "
            "(shed.trans.register_text_prompt_runner)."
        )
    return trans._TEXT_PROMPT_RUNNER


def run_text_prompt(
    context: CrawlerContext,
    prompt: str,
    string: str,
    max_tokens: int = 3000,
    cache_days: int = 100,
    model: str = DEFAULT_MODEL,
) -> TextPromptResponse:
    """llm.py:144-183: free-text prompt → raw response + cache key."""
    runner = _runner()
    cache_hash = hashlib.sha1(string.encode("utf-8"))
    cache_hash.update(prompt.encode("utf-8"))
    content = runner(context, prompt, string, model)
    return TextPromptResponse(content=str(content), cache_key=cache_hash.hexdigest())


def run_typed_text_prompt(
    context: CrawlerContext,
    prompt: str,
    string: str,
    response_type: Any,
    max_tokens: int = 3000,
    cache_days: int = 100,
    model: str = DEFAULT_MODEL,
):
    """llm.py:185-226: prompt constrained to a typed response. Without
    pydantic in this environment, ``response_type`` is any callable that
    validates/constructs from the parsed JSON object: the compat
    ``helpers.Names`` (``Names(**data)``), a dataclass, or a plain
    ``dict`` passthrough."""
    response = run_text_prompt(
        context, prompt, string, max_tokens=max_tokens,
        cache_days=cache_days, model=model,
    )
    data = json.loads(response.content)
    if response_type is dict or response_type is None:
        return data
    return response_type(**data)


def run_image_prompt(
    context: CrawlerContext,
    prompt: str,
    image_path: Any,
    max_tokens: int = 3000,
    cache_days: int = 100,
    model: str = DEFAULT_MODEL,
) -> Any:
    """llm.py:45-142: image prompt. The registered runner receives the
    prompt and the image path (the compat runner signature's ``text``
    slot carries the path — a vision-capable runner reads the file)."""
    response = run_text_prompt(
        context, prompt, str(image_path), max_tokens=max_tokens,
        cache_days=cache_days, model=model,
    )
    return json.loads(response.content)
