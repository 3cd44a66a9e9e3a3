"""EU Financial Sanctions Files (FSF) XML parsing
(``zavod/zavod/shed/fsf.py``): the shared parse family behind the EU
consolidated sanctions crawlers (eu_fsf, eu_travel_bans, national
mirrors). Re-expressed on the compat surface: stdlib DOM, the compat
entity factories (make_sanction / make_identification / make_address /
apply_reviewed_names), and per-dataset lookup tables for subject types,
identification schemes and contact info.

Third-party delegations re-expressed: followthemoney's country registry
becomes a seamable normalizer (``register_country_cleaner``) with a
name table for the codes the FSF actually carries; rigour's
``iso_639_alpha3`` becomes a 2→3-letter table; prefixdate's
``parse_parts`` becomes the ISO-prefix composer the engine's date
columns use.
"""

from __future__ import annotations

import re
from typing import Any

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext, Entity

#: e.g. "FDLR-FOCA is led by ... alias Rumuli" — a remark, not a quality
REGEX_LEADER_ALIAS = re.compile(r"led by .+ alias")

#: positions/titles arrive itemised "(a) Mullah, (b) Maulavi"
LETTER_SPLITS = ["(a)", "(b)", "(c)", "(d)", "(e)"]

#: ISO 639-1 → 639-2/T for the languages the FSF name elements carry
_LANG_ALPHA3 = {
    "en": "eng", "fr": "fra", "de": "deu", "es": "spa", "it": "ita",
    "pt": "por", "nl": "nld", "pl": "pol", "ro": "ron", "bg": "bul",
    "cs": "ces", "da": "dan", "el": "ell", "et": "est", "fi": "fin",
    "ga": "gle", "hr": "hrv", "hu": "hun", "lt": "lit", "lv": "lav",
    "mt": "mlt", "sk": "slk", "sl": "slv", "sv": "swe", "ru": "rus",
    "ar": "ara", "fa": "fas", "zh": "zho", "uk": "ukr", "be": "bel",
    "sr": "srp", "tr": "tur", "ka": "kat", "hy": "hye", "az": "aze",
    "ko": "kor", "ja": "jpn", "ur": "urd", "ps": "pus", "so": "som",
    "sw": "swa", "am": "amh", "he": "heb", "my": "mya", "th": "tha",
    "vi": "vie", "id": "ind", "ms": "msa", "hi": "hin", "bn": "ben",
}


def iso_639_alpha3(code: str) -> str | None:
    """rigour iso_639_alpha3 behaviour for the codes the FSF uses:
    3-letter codes pass through, 2-letter codes map, unknown → None."""
    code = code.strip().lower()
    if len(code) == 3 and code.isalpha():
        return code
    return _LANG_ALPHA3.get(code)


def parse_parts(year: Any, month: Any, day: Any) -> str | None:
    """prefixdate parse_parts: compose the longest valid ISO prefix from
    the available parts (year → year-month → full date)."""
    if not year:
        return None
    try:
        out = f"{int(year):04d}"
        if month and int(month):
            out += f"-{int(month):02d}"
            if day and int(day):
                out += f"-{int(day):02d}"
        return out
    except (TypeError, ValueError):
        return None


def as_bool(value: Any) -> bool:
    """banal.as_bool: truthy strings count."""
    if isinstance(value, bool):
        return value
    if value is None:
        return False
    return str(value).strip().lower() in ("true", "t", "yes", "y", "1")


#: country-name → ISO2 normalizer seam: a deployment registers its full
#: registry (the followthemoney country type); the built-in table covers
#: the descriptions the FSF fixture family uses
_COUNTRY_CLEANER: Any = None


def register_country_cleaner(fn: Any) -> None:
    global _COUNTRY_CLEANER
    _COUNTRY_CLEANER = fn


_COUNTRY_NAMES = {
    "afghanistan": "af", "belarus": "by", "china": "cn", "france": "fr",
    "germany": "de", "iran": "ir", "iraq": "iq", "libya": "ly",
    "myanmar": "mm", "north korea": "kp",
    "democratic people's republic of korea": "kp", "russia": "ru",
    "russian federation": "ru", "somalia": "so", "south sudan": "ss",
    "sudan": "sd", "syria": "sy", "syrian arab republic": "sy",
    "ukraine": "ua", "united kingdom": "gb", "united states": "us",
    "venezuela": "ve", "yemen": "ye", "zimbabwe": "zw", "serbia": "rs",
}


def _clean_country(description: str | None) -> str | None:
    if description is None:
        return None
    if _COUNTRY_CLEANER is not None:
        return _COUNTRY_CLEANER(description)
    return _COUNTRY_NAMES.get(description.strip().lower())


def parse_country(node: Any) -> str | None:
    """fsf.py:21-31: description wins when it normalizes; the legacy CS
    (Serbia-Montenegro) ISO2 maps to RS."""
    description = node.get("countryDescription")
    if description == "UNKNOWN":
        return None
    code = _clean_country(description)
    if code is not None:
        return code
    code = node.get("countryIso2Code")
    if code == "CS":
        return "RS"
    return code


def parse_address(context: CrawlerContext, el: Any) -> Entity | None:
    """fsf.py:34-49."""
    country = el.get("countryDescription")
    if country == "UNKNOWN":
        country = None
    return h.make_address(
        context,
        street=el.get("street"),
        po_box=el.get("poBox"),
        city=el.get("city"),
        place=el.get("place"),
        postal_code=el.get("zipCode"),
        region=el.get("region"),
        country=country,
        country_code=parse_country(el),
    )


def parse_sanctions(
    context: CrawlerContext,
    entity: Entity,
    entry: Any,
    program_attrib: str = "programme",
) -> None:
    """fsf.py:52-113: one Sanction per regulation, keyed by the
    publication URL; start date = earliest of designation and
    entry-into-force; the source program key routes through the
    sanction-program lookup."""
    for regulation in entry.findall("./regulation"):
        url = regulation.findtext("./publicationUrl")
        assert url is not None, "regulation without publicationUrl"
        source_program_key = regulation.get(program_attrib)
        sanction = h.make_sanction(
            context,
            entity,
            program_name=source_program_key,
            source_program_key=source_program_key,
            program_key=(
                h.lookup_sanction_program_key(context, source_program_key)
                if source_program_key
                else None
            ),
            key=url,
        )
        sanction.set("sourceUrl", url)
        sanction.add("reason", regulation.get("numberTitle"))
        start_dates = [
            entry.get("designationDate"),
            regulation.get("entryIntoForceDate"),
        ]
        valid = [d for d in start_dates if d is not None]
        sanction.add("startDate", min(valid, default=None))
        sanction.add("listingDate", regulation.get("publicationDate"))
        entity.add("modifiedAt", regulation.get("entryIntoForceDate"))
        sanction.add("unscId", entry.get("unitedNationId"))
        sanction.add("authorityId", entry.get("euReferenceNumber"))
        context.emit(sanction)


#: at least one name in one of these → other languages become aliases
_INTERESTING_LANGUAGES = {None, "eng", "zho", "rus", "fas", "ara"}


def parse_entry(context: CrawlerContext, entry: Any) -> None:
    """fsf.py:116-300: one sanctionEntity element → the FtM entity, its
    sanctions, identifications, addresses and reviewed names."""
    eu_ref = entry.get("euReferenceNumber")
    if eu_ref is not None:
        entity_id = context.make_slug(eu_ref, prefix="eu-fsf")
    else:
        entity_id = context.make_slug("logical", entry.get("logicalId"))

    subject_type = entry.find("./subjectType")
    if subject_type is None:
        context.log.warning("Unknown subject type", entry=str(entry))
        return
    schema = context.lookup_value("subject_type", subject_type.get("code"))
    if schema is None:
        context.log.warning("Unknown subject type", type=subject_type.get("code"))
        return
    schema = context.lookup_value("schema_override", entity_id, schema)
    if schema is None:
        context.log.warning("Broken schema override", entity_id=entity_id)
        return

    entity = context.make(schema)
    entity.id = entity_id
    entity.add("notes", h.clean_note(entry.findtext("./remark")))
    entity.add("topics", "sanction")
    parse_sanctions(context, entity, entry)

    name_el_to_lang: dict[Any, str | None] = {}
    for name_el in entry.findall("./nameAlias"):
        raw_lang = name_el.get("nameLanguage")
        lang = iso_639_alpha3(raw_lang) if raw_lang else None
        if lang is None and raw_lang is not None and len(raw_lang):
            context.log.warning("Unknown language", lang=raw_lang)
            continue
        name_el_to_lang[name_el] = lang

    original = h.Names()
    has_interesting = bool(
        set(name_el_to_lang.values()) & _INTERESTING_LANGUAGES
    )
    for name, lang in name_el_to_lang.items():
        # an uninteresting-language name demotes to alias only when an
        # interesting-language one exists (fsf.py:155-162)
        name_prop = "name"
        if has_interesting and lang not in _INTERESTING_LANGUAGES:
            name_prop = "alias"

        is_weak = not as_bool(name.get("strong"))
        remark = name.findtext("./remark")
        if remark is not None:
            lremark = remark.lower()
            if "low quality" in lremark or "lo quality" in lremark:
                is_weak = True
                remark = None
            elif "ood quality" in lremark or "god quality" in lremark:
                remark = None
            elif "high quality" in lremark:
                remark = None
            elif "quality" in lremark:
                context.log.warning("Unknown quality", remark=remark)
            elif REGEX_LEADER_ALIAS.search(lremark):
                pass
            elif "alias" in lremark:
                context.log.warning("Unknown alias remark", remark=remark)
            entity.add("notes", remark, quiet=True)

        full_name = name.get("wholeName")
        first_name = name.get("firstName")
        middle_name = name.get("middleName")
        last_name = name.get("lastName")
        if not full_name and (first_name and last_name):
            full_name = h.make_name(
                full=full_name,
                first_name=first_name,
                middle_name=middle_name,
                last_name=last_name,
            )
        if is_weak:
            name_prop = "weakAlias"
        else:
            entity.add("firstName", first_name, quiet=True, lang=lang)
            entity.add("middleName", middle_name, quiet=True, lang=lang)
            entity.add("lastName", last_name, quiet=True, lang=lang)
        original.add(name_prop, full_name, lang=lang)

        titles = [
            t.strip(", ")
            for t in h.multi_split(name.get("title", ""), LETTER_SPLITS)
        ]
        entity.add("title", titles, quiet=True, lang=lang)
        if entity.schema.is_a("Person"):
            positions = [
                t.strip(", ")
                for t in h.multi_split(name.get("function", ""), LETTER_SPLITS)
            ]
            entity.add("position", positions, lang=lang)
        else:
            entity.add("notes", name.get("function"), lang=lang)
        entity.add("gender", name.get("gender"), quiet=True, lang=lang)

    h.apply_reviewed_names(context, entity, original=original)

    for node in entry.findall("./identification"):
        doc_type = node.get("identificationTypeCode")
        country = parse_country(node)
        latin_number = node.get("latinNumber")
        number = node.get("number") or latin_number
        result = context.lookup("identification_type", doc_type)
        if result is None:
            context.log.warning(
                "Unknown identification type",
                doc_type=doc_type, number=number, country=country,
            )
            continue
        if result.prop is not None:
            entity.add(result.prop, number, quiet=True)
            entity.add(result.prop, latin_number, quiet=True)
            entity.add("country", country, quiet=True)
        if result.schema is not None:
            passport = h.make_identification(
                context,
                entity,
                number=number,
                doc_type=node.get("identificationTypeDescription"),
                authority=node.get("issuedBy"),
                start_date=node.get("issueDate"),
                country=country,
                key=node.get("logicalId"),
            )
            if passport is not None:
                passport.add("number", latin_number)
                for remark_node in node.findall("./remark"):
                    passport.add("summary", remark_node.text)
                context.emit(passport)

    for node in entry.findall("./address"):
        address = parse_address(context, node)
        h.apply_address(context, entity, address)
        for child in list(node):
            if child.tag == "regulationSummary":
                continue
            elif child.tag == "remark":
                entity.add("notes", child.text)
            elif child.tag == "contactInfo":
                res = context.lookup("contact_info", child.get("key"))
                if res is None:
                    context.log.warning(
                        "Unknown contact info", key=child.get("key")
                    )
                elif res.prop is not None:
                    values = h.multi_split(child.get("value"), [",", ";"])
                    entity.add(res.prop, [v.strip() for v in values])
            else:
                context.log.warning("Unknown address component", tag=child.tag)

    for birth in entry.findall("./birthdate"):
        partial = parse_parts(
            birth.get("year"), birth.get("month"), birth.get("day")
        )
        entity.add("birthDate", birth.get("birthdate"))
        entity.add("birthDate", partial)
        address = parse_address(context, birth)
        if address is not None:
            entity.add("birthPlace", address.get("full"))
            entity.add("country", address.get("country"))

    for node in entry.findall("./citizenship"):
        entity.add("nationality", parse_country(node), quiet=True)

    context.emit(entity)
