"""Column-expression kernels (SURVEY.md §2.3).

Everything here returns native ``pyspark.sql.Column`` expressions so the
whole clean/derive stage compiles into one whole-stage-codegen'd map — no
Python in the hot path. All functions are ANSI-mode safe (``try_*``
variants for anything that can fail on malformed input).
"""

from .cleaning import (  # noqa: F401
    blank_as_null,
    clean_string,
    coerce_boolean,
    ensure_str_id,
    nonblank,
)
from .dates import (  # noqa: F401
    fmt_display,
    fmt_iso,
    month_group,
    month_tag,
    parse_date_dayfirst,
    parse_multi_dates,
)
from .arrays import split_multi_ids  # noqa: F401
from .consignee import (  # noqa: F401
    extract_consignee_code,
    extract_consignee_name,
)
