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
