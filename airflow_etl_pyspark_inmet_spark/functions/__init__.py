from .cleaning import (  # noqa: F401
    decimal_comma_to_double,
    dayfirst_date,
    sanitize_name,
    sanitize_columns,
    surrogate_key,
    zero_fill,
    date_parts,
)
