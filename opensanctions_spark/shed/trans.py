"""LLM translation / transliteration helpers
(``zavod/zavod/shed/trans.py``): the name-transliteration family a set
of reference crawlers calls (``apply_translit_full_name``,
``translate_position_name`` — the engine that `helpers.make_position`'s
``translate_name`` rides).

The LLM call goes through a registered text-prompt runner (the same
injection pattern as every external service here: ``register_name
_cleaner``, ``register_http_fetcher``). The prompt text is an
EQUIVALENT instruction, not a copy of the reference's — its exact
wording only matters as part of the cache key (same precedent as
``sources/names_extract.py``). Responses must be a JSON object keyed by
ISO 639-2 codes; invalid JSON or unexpected keys yield an empty result
with a logged error, exactly the reference's failure routing.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, NamedTuple, Sequence

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext, Entity
from opensanctions_spark.helpers import LangText

DEFAULT_MODEL = "llm"


class TransliterationLanguageSpec(NamedTuple):
    """trans.py:14-25."""

    language_code: str
    script: str
    language_name: str


ENGLISH = TransliterationLanguageSpec("eng", "Latin", "English")
RUSSIAN = TransliterationLanguageSpec("rus", "Cyrillic", "Russian")
ARABIC = TransliterationLanguageSpec("ara", "Arabic", "Arabic")

PREFERRED_LANGUAGE = ENGLISH


def make_name_translit_prompt(
    input_code: str, output_specs: Sequence[TransliterationLanguageSpec]
) -> str:
    """Equivalent of trans.py:67-78: request one JSON key per output
    spec, each value the name rendered in that spec's script."""
    bullets = "\n".join(
        f"- '{spec.language_code}': the name in {spec.script} script, "
        f"written for {spec.language_name} pronunciation"
        for spec in output_specs
    )
    return (
        f"The following personal or organisation name is written in the "
        f"language with ISO 639-2 code {input_code}. Transliterate it and "
        f"reply with a JSON object where\n{bullets}.\n"
        "Translate a legal-form prefix or suffix of a company name into "
        "its customary abbreviation in the target language; if the input "
        "holds several names, keep them together in each output value."
    )


def make_position_translation_prompt(input_code: str) -> str:
    """Equivalent of trans.py:80-82 + the place-name guidance."""
    return (
        f"Translate this public-office position label from the language "
        f"with ISO 639-2 code {input_code} into English; reply with a "
        "JSON object whose key 'eng' holds the English label. Keep place "
        "names as they are — use an English exonym only for very widely "
        "known places, and transliterate (never translate) less common "
        "non-Latin place names."
    )


@dataclass(frozen=True, kw_only=True)
class TranslationResult:
    """trans.py:85-103."""

    texts: list[LangText]
    cache_key: str | None
    origin: str

    def get_preferred_language(self) -> LangText | None:
        for text in self.texts:
            if text.lang == "eng":
                return text
        return None


#: pluggable LLM text boundary: (context, prompt, text, model) -> str
#: (the raw model response, a JSON object string). None = unconfigured.
_TEXT_PROMPT_RUNNER: Any = None


def register_text_prompt_runner(fn: Any) -> None:
    global _TEXT_PROMPT_RUNNER
    _TEXT_PROMPT_RUNNER = fn


def run_translation_prompt(
    context: CrawlerContext,
    *,
    prompt: str,
    text: str,
    output_langs: list[str] = ["eng"],
    model: str = DEFAULT_MODEL,
) -> TranslationResult:
    """trans.py:105-163: run the prompt, validate the JSON-by-language
    response, empty result (with logged error) on any failure."""
    if _TEXT_PROMPT_RUNNER is None:
        context.log.error(
            "LLM translation skipped: no text-prompt runner registered "
            "(register_text_prompt_runner)"
        )
        return TranslationResult(texts=[], cache_key=None, origin=model)
    content = _TEXT_PROMPT_RUNNER(context, prompt, text, model)
    try:
        trans_by_lang = json.loads(content)
    except (TypeError, ValueError):
        context.log.error(
            "LLM translation returned invalid JSON",
            text=text, model=model, response_content=str(content)[:200],
        )
        return TranslationResult(texts=[], cache_key=None, origin=model)
    if not set(trans_by_lang.keys()).issubset(output_langs):
        context.log.warning(
            "LLM translation returned unexpected keys",
            text=text, model=model, expected=sorted(output_langs),
        )
        return TranslationResult(texts=[], cache_key=None, origin=model)
    results: list[LangText] = []
    for lang in output_langs:
        value = trans_by_lang.get(lang)
        if not isinstance(value, str) or not value.strip():
            continue
        results.append(LangText(text=value, lang=lang))
    return TranslationResult(
        texts=results, cache_key=h.review_key([prompt, text]), origin=model
    )


def translate_position_name(
    context: CrawlerContext,
    label: LangText,
    *,
    model: str = DEFAULT_MODEL,
) -> TranslationResult:
    """trans.py:166-182."""
    assert label.lang is not None, "Source language is required for translation"
    prompt = make_position_translation_prompt(label.lang)
    return run_translation_prompt(context, prompt=prompt, text=label.text, model=model)


def apply_translit_names(
    context: CrawlerContext,
    entity: Entity,
    *,
    input_code: str,
    first_name: str,
    last_name: str,
    output_spec: Sequence[TransliterationLanguageSpec] = (ENGLISH,),
    model: str = DEFAULT_MODEL,
) -> None:
    """trans.py:185-253: transliterate first+last and apply as a full
    name per output language."""
    prompt = make_name_translit_prompt(input_code, list(output_spec))
    output_langs = [spec.language_code for spec in output_spec]
    result = run_translation_prompt(
        context,
        prompt=prompt,
        text=f"{first_name} {last_name}",
        output_langs=output_langs,
        model=model,
    )
    for lang_text in result.texts:
        h.apply_name(
            entity, full=lang_text.text, lang=lang_text.lang, origin=result.origin
        )


def apply_translit_full_name(
    context: CrawlerContext,
    entity: Entity,
    name: LangText,
    *,
    output: Sequence[TransliterationLanguageSpec] = (PREFERRED_LANGUAGE,),
    prompt: str | None = None,
    alias: bool = False,
    model: str = DEFAULT_MODEL,
) -> None:
    """trans.py:256-296: one transliterated name per output spec,
    applied as name or alias with the model as origin."""
    assert name.lang is not None, "Source language is required for transliteration"
    if prompt is None:
        prompt = make_name_translit_prompt(name.lang, output)
    output_langs = [spec.language_code for spec in output]
    result = run_translation_prompt(
        context, prompt=prompt, text=name.text, output_langs=output_langs,
        model=model,
    )
    for lang_text in result.texts:
        h.apply_name(
            entity,
            full=lang_text.text,
            lang=lang_text.lang,
            alias=alias,
            origin=result.origin,
        )
