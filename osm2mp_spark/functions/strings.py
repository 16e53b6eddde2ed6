"""String/text kernels (SURVEY §2.2 F8-F11): cleanup chains, transliteration.

Everything that a regexp/translate can express stays JVM-side; the
unidecode-style transliteration of arbitrary Unicode is a vectorized pandas
UDF over a broadcast substitution table (lib/TextFilter.pm:18-121 and
lib/LangTransform/Subst.pm semantics — table contents ours).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

# forbidden symbols + control chars + leading punctuation + space collapse
# (osm2mp.pl:1117-1130 semantics)
def clean_label(col: Column) -> Column:
    c = F.regexp_replace(col, r"[\x00-\x1f\[\]{}|`~]", "")
    c = F.regexp_replace(c, r"^[\s\.,;:!\?\-]+", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


# small Latin-diacritic + Cyrillic table — enough to demonstrate the
# substitution-table transliteration shape; extend per language pack
_TRANSLIT = {
    "ä": "a", "ö": "o", "ü": "u", "ß": "ss", "é": "e", "è": "e", "ê": "e",
    "á": "a", "à": "a", "â": "a", "ç": "c", "ñ": "n", "ø": "o", "å": "a",
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ж": "zh",
    "з": "z", "и": "i", "й": "j", "к": "k", "л": "l", "м": "m", "н": "n",
    "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u", "ф": "f",
    "х": "h", "ц": "c", "ч": "ch", "ш": "sh", "щ": "sch", "ъ": "", "ы": "y",
    "ь": "", "э": "e", "ю": "ju", "я": "ja",
}


# ---------------------------------------------------------------------------
# F12: street-type abbreviation rewrite (mp-postprocess.pl:116-173).
# Table = the reference's RU/UA street-type spec (config data: pattern →
# canonical abbreviation, first match wins); kernel re-expressed in Python.
# ---------------------------------------------------------------------------

import re as _re

_SHORT_NAMES: list[tuple[str, str]] = [
    # russian (mp-postprocess.pl:117-134)
    (r"ул(?:|ица)", "ул."),
    (r"пер(?:|еул|еулок)", "пер."),
    (r"пр(?:\-к?т|осп|оспект)", "пр-т"),
    (r"пр(?:\-з?д|оезд)", "пр-д"),
    (r"п", "п."),
    (r"пл(?:|ощадь)", "пл."),
    (r"ш(?:|оссе)", "ш."),
    (r"туп(?:|ик)", "туп."),
    (r"б(?:ул|ульв|\-р|ульвар)", "б-р"),
    (r"наб(?:|ережная)", "наб."),
    (r"ал(?:|лея)", "ал."),
    (r"мост", "мост"),
    (r"тракт", "тракт"),
    (r"просек", "просек"),
    (r"линия", "линия"),
    (r"кв(?:|арт|артал)", "кв."),
    (r"м(?:к?рн?|икрорайон)", "мкр"),
    # ukrainian (:136-144)
    (r"вул(?:|иця)", "вул."),
    (r"пр(?:|овулок)", "пр."),
    (r"шосе", "ш."),
    (r"проїзд", "пр-д"),
    (r"площа", "пл."),
    (r"мікрорайон", "мкр"),
    (r"набережна", "наб."),
    (r"алея", "ал."),
]

_SHORT_RES = [
    (_re.compile(
        r"^(?:(.*\S)?\s+)?" + pat + r"(?:(?:\s+|\s*\.\s*)(.*))?$",
        _re.IGNORECASE,
    ), abbrev)
    for pat, abbrev in _SHORT_NAMES
]


def clear_street(name: str | None) -> str | None:
    """_clear_street (mp-postprocess.pl:149-173): ucfirst every word, find
    the first street-type token (standalone, prefix or suffix), move its
    canonical abbreviation to the end, normalize '1-й'-style ordinals to
    the tail. Unmatched names return the ORIGINAL string unchanged."""
    if name is None:
        return None
    line = " ".join(
        w[:1].upper() + w[1:] for w in name.split(" ") if w
    )
    for rx, abbrev in _SHORT_RES:
        m = rx.match(line)
        if not m:
            continue
        prefix, postfix = m.group(1), m.group(2)
        if not (prefix or postfix):
            continue
        out = " ".join(p for p in (prefix, postfix) if p)
        out = _re.sub(r"(\d+-?.?[йяе])(\s+(.*))", r"\2 \1", out, count=1)
        out = _re.sub(r"(\d+)-?.?([йяе])(\s.*)?$", r"\1-\2", out, count=1)
        out = _re.sub(r"\s\s+", " ", out, count=1)
        out = _re.sub(r"^ ", "", out, count=1)
        out = _re.sub(r" $", "", out, count=1)
        return f"{out} {abbrev}"
    return name


def make_street_abbrev_udf(spark):
    """Vectorized F12 kernel (regex table is compiled once per worker)."""

    @F.pandas_udf("string")
    def abbrev(s: pd.Series) -> pd.Series:
        return s.map(clear_street)

    return abbrev


def make_translit_udf(spark):
    """Vectorized transliteration UDF reading the broadcast table (F10/F11
    last-resort fallback of lib/LangSelect.pm:113-146)."""
    table = dict(_TRANSLIT)
    table.update({k.upper(): v.upper() for k, v in _TRANSLIT.items() if v})
    b = spark.sparkContext.broadcast(table)

    @F.pandas_udf("string")
    def translit(s: pd.Series) -> pd.Series:
        t = b.value

        def tr(x):
            if x is None:
                return None
            return "".join(t.get(ch, ch) for ch in x)

        return s.map(tr)

    return translit
