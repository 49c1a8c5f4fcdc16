"""Per-cell datatype coercion kernel — pure Python, executor-safe.

Mirrors the reference's ``value_matching_datatype``
(reference: lib/rdf/tabular/metadata.rb:1749-1921) including its lexical
fidelity rules: invalid lexicals fall back to plain literals with accumulated
errors, numeric normalization is string surgery (groupChar/decimalChar/%/‰),
and date/time values are re-composed to ISO-8601 with the original timezone
text appended. This cannot be a bare Spark ``cast`` — byte fidelity with the
reference output is the contract; it runs vectorized inside Arrow-batched
pandas UDF stages (operators/triples.py).
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation
from typing import NamedTuple, Optional

from .context import CSVW, RDF, XSD
from .model import REJECTED_TYPES

# base name → datatype IRI (reference: metadata.rb:39-90 DATATYPES + aliases :83-89)
def _xsd(n: str) -> str:
    return XSD + n

DATATYPE_IRIS: dict[str, str] = {
    **{n: _xsd(n) for n in (
        "anyAtomicType anyURI base64Binary boolean byte date dateTime dateTimeStamp decimal "
        "double duration dayTimeDuration float gDay gMonth gMonthDay gYear gYearMonth hexBinary "
        "int integer language long Name NCName negativeInteger nonNegativeInteger "
        "nonPositiveInteger normalizedString positiveInteger QName short string time token "
        "unsignedByte unsignedInt unsignedLong unsignedShort yearMonthDuration NOTATION"
    ).split()},
    "any": _xsd("anyAtomicType"),
    "binary": _xsd("base64Binary"),
    "datetime": _xsd("dateTime"),
    "number": _xsd("double"),
    "xml": RDF + "XMLLiteral",
    "html": RDF + "HTML",
    "json": CSVW + "JSON",
}

NUMERIC_BASES = frozenset(
    "decimal integer long int short byte nonNegativeInteger positiveInteger unsignedLong "
    "unsignedInt unsignedShort unsignedByte nonPositiveInteger negativeInteger double float number".split()
)
DATE_BASES = frozenset(["date", "time", "dateTime", "dateTimeStamp", "datetime"])
DURATION_BASES = frozenset(["duration", "dayTimeDuration", "yearMonthDuration"])
STRING_FAMILY = frozenset(["string", "anyAtomicType", "any"])

_INT_RANGES = {
    "long": (-(2**63), 2**63 - 1),
    "int": (-(2**31), 2**31 - 1),
    "short": (-32768, 32767),
    "byte": (-128, 127),
    "unsignedLong": (0, 2**64 - 1),
    "unsignedInt": (0, 2**32 - 1),
    "unsignedShort": (0, 65535),
    "unsignedByte": (0, 255),
    "nonNegativeInteger": (0, None),
    "positiveInteger": (1, None),
    "nonPositiveInteger": (None, 0),
    "negativeInteger": (None, -1),
}

_TZ_RE = r"(Z|[+-]\d{2}:\d{2}|[+-]\d{2}(\d{2})?)"
_VALID_RES = {
    "integer": re.compile(r"^[+-]?\d+$"),
    "decimal": re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)$"),
    "double": re.compile(r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)$"),
    "date": re.compile(r"^-?\d{4,}-\d{2}-\d{2}" + _TZ_RE + r"?$"),
    "time": re.compile(r"^\d{2}:\d{2}:\d{2}(\.\d+)?" + _TZ_RE + r"?$"),
    "dateTime": re.compile(r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?" + _TZ_RE + r"?$"),
    "dateTimeStamp": re.compile(r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?" + _TZ_RE + r"$"),
    "gYear": re.compile(r"^-?\d{4,}" + _TZ_RE + r"?$"),
    "gYearMonth": re.compile(r"^-?\d{4,}-\d{2}" + _TZ_RE + r"?$"),
    "gMonth": re.compile(r"^--\d{2}" + _TZ_RE + r"?$"),
    "gMonthDay": re.compile(r"^--\d{2}-\d{2}" + _TZ_RE + r"?$"),
    "gDay": re.compile(r"^---\d{2}" + _TZ_RE + r"?$"),
    "duration": re.compile(r"^-?P(?=.)(\d+Y)?(\d+M)?(\d+D)?(T(?=.)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$"),
    "dayTimeDuration": re.compile(r"^-?P(?=.)(\d+D)?(T(?=.)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$"),
    "yearMonthDuration": re.compile(r"^-?P(?=.)(\d+Y)?(\d+M)?$"),
    "base64Binary": re.compile(r"^[A-Za-z0-9+/\s]*={0,2}$"),
    "hexBinary": re.compile(r"^([0-9a-fA-F]{2})*$"),
    "language": re.compile(r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$"),
    "boolean": re.compile(r"^(true|false|1|0)$"),
    # XML Name family (ASCII productions; full-Unicode NameStartChar is
    # out of subset): Name allows colons, NCName forbids them, QName is
    # NCName(:NCName)?
    "Name": re.compile(r"^[A-Za-z_:][A-Za-z0-9._:-]*$"),
    "NCName": re.compile(r"^[A-Za-z_][A-Za-z0-9._-]*$"),
    "QName": re.compile(
        r"^[A-Za-z_][A-Za-z0-9._-]*(:[A-Za-z_][A-Za-z0-9._-]*)?$"),
}

_MONTH_DAYS = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _valid_ymd(y: int, mo: int, d: int) -> bool:
    if not (1 <= mo <= 12 and 1 <= d <= _MONTH_DAYS[mo - 1]):
        return False
    if mo == 2 and d == 29:
        return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
    return True


def _lexical_valid(base: str, lexical: str) -> bool:
    """Approximation of RDF::Literal#valid? per XSD type."""
    if base in ("double", "float", "number"):
        return bool(_VALID_RES["double"].match(lexical))
    if base == "decimal":
        return bool(_VALID_RES["decimal"].match(lexical))
    if base == "integer" or base in _INT_RANGES:
        if not _VALID_RES["integer"].match(lexical):
            return False
        lo, hi = _INT_RANGES.get(base, (None, None))
        v = int(lexical)
        return (lo is None or v >= lo) and (hi is None or v <= hi)
    if base in ("date", "dateTime", "dateTimeStamp", "datetime"):
        key = "dateTime" if base == "datetime" else base
        m = _VALID_RES[key].match(lexical)
        if not m:
            return False
        dm = re.match(r"^-?(\d{4,})-(\d{2})-(\d{2})", lexical)
        return _valid_ymd(int(dm.group(1)), int(dm.group(2)), int(dm.group(3))) if dm else False
    if base == "time":
        m = _VALID_RES["time"].match(lexical)
        if not m:
            return False
        hh, mm, ss = int(lexical[0:2]), int(lexical[3:5]), int(lexical[6:8])
        return hh <= 24 and mm <= 59 and ss <= 59
    rx = _VALID_RES.get(base)
    return bool(rx.match(lexical)) if rx else True


class CellValue(NamedTuple):
    """One typed atom: lexical form + datatype IRI + language tag."""
    lexical: Optional[str]
    datatype: Optional[str]  # None → plain / language-tagged string
    lang: Optional[str]

    def to_binding(self) -> str:
        return self.lexical or ""


_DATE_PARTS = {
    "yyyy-MM-dd": re.compile(r"^(?P<yr>\d{4})-(?P<mo>\d{2})-(?P<da>\d{2})"),
    "yyyyMMdd": re.compile(r"^(?P<yr>\d{4})(?P<mo>\d{2})(?P<da>\d{2})"),
    "dd-MM-yyyy": re.compile(r"^(?P<da>\d{2})-(?P<mo>\d{2})-(?P<yr>\d{4})"),
    "d-M-yyyy": re.compile(r"^(?P<da>\d{1,2})-(?P<mo>\d{1,2})-(?P<yr>\d{4})"),
    "MM-dd-yyyy": re.compile(r"^(?P<mo>\d{2})-(?P<da>\d{2})-(?P<yr>\d{4})"),
    "M-d-yyyy": re.compile(r"^(?P<mo>\d{1,2})-(?P<da>\d{1,2})-(?P<yr>\d{4})"),
    "dd/MM/yyyy": re.compile(r"^(?P<da>\d{2})/(?P<mo>\d{2})/(?P<yr>\d{4})"),
    "d/M/yyyy": re.compile(r"^(?P<da>\d{1,2})/(?P<mo>\d{1,2})/(?P<yr>\d{4})"),
    "MM/dd/yyyy": re.compile(r"^(?P<mo>\d{2})/(?P<da>\d{2})/(?P<yr>\d{4})"),
    "M/d/yyyy": re.compile(r"^(?P<mo>\d{1,2})/(?P<da>\d{1,2})/(?P<yr>\d{4})"),
    "dd.MM.yyyy": re.compile(r"^(?P<da>\d{2})\.(?P<mo>\d{2})\.(?P<yr>\d{4})"),
    "d.M.yyyy": re.compile(r"^(?P<da>\d{1,2})\.(?P<mo>\d{1,2})\.(?P<yr>\d{4})"),
    "MM.dd.yyyy": re.compile(r"^(?P<mo>\d{2})\.(?P<da>\d{2})\.(?P<yr>\d{4})"),
    "M.d.yyyy": re.compile(r"^(?P<mo>\d{1,2})\.(?P<da>\d{1,2})\.(?P<yr>\d{4})"),
    "yyyy-MM-ddTHH:mm:ss": re.compile(
        r"^(?P<yr>\d{4})-(?P<mo>\d{2})-(?P<da>\d{2})T(?P<hr>\d{2}):(?P<mi>\d{2}):(?P<se>\d{2})"
    ),
}
_TIME_PARTS = {
    "HH:mm:ss": re.compile(r"^(?P<hr>\d{2}):(?P<mi>\d{2}):(?P<se>\d{2})"),
    "HHmmss": re.compile(r"^(?P<hr>\d{2})(?P<mi>\d{2})(?P<se>\d{2})"),
    "HH:mm": re.compile(r"^(?P<hr>\d{2}):(?P<mi>\d{2})(?P<se>)"),
    "HHmm": re.compile(r"^(?P<hr>\d{2})(?P<mi>\d{2})(?P<se>)"),
}
# [dymsS]: the reference stops at [dyms] (metadata.rb:1827); the extra
# S lets a fractional-second picture carry a timezone suffix too
_TZ_FORMAT_RE = re.compile(r"^(.*[dymsS])+(\s*[xX]{1,5})$")
# W3C-final extension the reference's whitelist omits (metadata.rb:1867
# errors on any format containing '.S'): a '.S'+ suffix on a
# seconds-bearing picture matches EXACTLY that many fractional-second
# digits (UAX-35 'S' = fractional digit) and carries them into the
# canonical lexical form.
_FRACTION_FMT_RE = re.compile(r"^(?P<rest>.*ss)\.(?P<fr>S{1,9})$")


def _fmt_num(x) -> str:
    if isinstance(x, Decimal):
        s = format(x.normalize(), "f")
        return s
    if isinstance(x, float):
        s = repr(x)
        return s
    return str(x)


def _picture_mismatch(value: str, picture: str, group_char: str,
                      dec_char: str) -> Optional[str]:
    """W3C-final numeric formats given as a STRING are a number PICTURE
    (UAX#35 DecimalFormat subset: 0 required digit, # optional digit,
    '.' decimal point, ',' group, %/‰ suffix) — NOT a regex (that is the
    draft-era `pattern` key). Minimal semantics: required integer/
    fraction digit counts, fraction width cap, suffix agreement; actual
    group/decimal characters come from groupChar/decimalChar."""
    pct = picture.endswith("%")
    pml = picture.endswith("‰")
    core = picture.rstrip("%‰").lstrip("+-")
    # UAX-35 scientific notation: mantissa picture 'E' exponent picture
    # ('0' = required exponent digit); absent E forbids an exponent
    core, _, exp_pic = core.partition("E")
    min_exp = exp_pic.count("0")
    int_pic, _, frac_pic = core.partition(".")
    min_int = int_pic.count("0")
    min_frac = frac_pic.count("0")
    max_frac = sum(1 for c in frac_pic if c in "0#")
    g, d = re.escape(group_char), re.escape(dec_char)
    m = re.fullmatch(
        rf"[+-]?(\d[\d{g}]*)(?:{d}(\d+))?(?:[eE]([+-]?\d+))?(%|‰)?", value)
    reason = None
    if not m:
        reason = "shape"
    else:
        int_digits = m.group(1).replace(group_char, "")
        frac_digits = m.group(2) or ""
        exp_digits = (m.group(3) or "").lstrip("+-")
        suffix = m.group(4)
        if len(int_digits) < min_int:
            reason = "integer digits"
        elif not (min_frac <= len(frac_digits) <= max_frac):
            reason = "fraction digits"
        elif not exp_pic and exp_digits:
            reason = "unexpected exponent"
        elif exp_pic and len(exp_digits) < min_exp:
            reason = "exponent digits"
        elif (suffix == "%") != pct or (suffix == "‰") != pml:
            reason = "suffix"
    if reason:
        return f"{value} does not match number format {picture}"
    return None


def _match_numeric(value: str, dt: dict, base: str, errors: list[str]) -> Optional[CellValue]:
    fmt = dt.get("format")
    if isinstance(fmt, dict):
        # W3C-final number-format object nests groupChar/decimalChar/
        # pattern under `format`; the reference reads only the draft-era
        # top-level keys (metadata.rb:1772-1782). Accept both shapes —
        # nested wins when present.
        dt = {**dt, **{k: fmt[k]
                       for k in ("groupChar", "decimalChar", "pattern")
                       if k in fmt}}
    group_char = dt.get("groupChar", ",")
    if isinstance(fmt, str) and fmt:
        err = _picture_mismatch(value, fmt, group_char,
                                dt.get("decimalChar", "."))
        if err:
            errors.append(err)
    if dt.get("pattern") and not re.search(dt["pattern"], value):
        errors.append(f"{value} does not match pattern {dt['pattern']}")
    if group_char * 2 in value:
        errors.append(f"{value} has repeating {group_char!r}")
    value = value.replace(group_char, "")
    dec_char = dt.get("decimalChar", ".")
    if dec_char in value:
        value = value.replace(dec_char, ".", 1)

    percent = permille = False
    if value.endswith("%"):
        value, percent = value[:-1], True
    elif value.endswith("‰"):
        value, permille = value[:-1], True

    lexical = value
    if percent or permille:
        div = 100 if percent else 1000
        try:
            if base in ("double", "float", "number"):
                lexical = _fmt_num(float(value) / div)
            elif base == "decimal":
                lexical = _fmt_num(Decimal(value) / div)
            else:
                lexical = str(int(value) // div)  # Ruby Integer division semantics
        except (ValueError, InvalidOperation):
            errors.append(f"{value} is not a valid {base}")
            return None
    if not _lexical_valid(base, lexical):
        errors.append(f"{lexical} is not a valid {base}")
        return None
    return CellValue(lexical, DATATYPE_IRIS[base], None)


def _match_boolean(value: str, dt: dict, errors: list[str]) -> Optional[CellValue]:
    fmt = dt.get("format")
    iri = DATATYPE_IRIS["boolean"]
    if fmt:
        t, _, f = str(fmt).partition("|")
        if value == t:
            return CellValue("true", iri, None)
        if value == f:
            return CellValue("false", iri, None)
        errors.append(f"{value} does not match boolean format {fmt}")
        if not _lexical_valid("boolean", value):
            errors.append(f"{value} is not a valid boolean")
        return None
    low = value.lower()
    if low in ("1", "true"):
        return CellValue("true", iri, None)
    if low in ("0", "false"):
        return CellValue("false", iri, None)
    errors.append(f"{value} is not a valid boolean")
    return None


def _match_datetime(value: str, dt: dict, base: str, errors: list[str]) -> Optional[CellValue]:
    fmt = dt.get("format")
    orig_value, orig_fmt = value, fmt
    tz = None
    if fmt:
        m = _TZ_FORMAT_RE.match(fmt)
        if m:
            fmt, tz = m.group(1), m.group(2)
    if fmt:
        parts = fmt.split(" ")
        date_format, time_format = (parts + [None])[:2]
        if base == "time":
            date_format, time_format = None, date_format

        # strip a fractional-seconds suffix off whichever part carries
        # the seconds (the combined yyyy-MM-ddTHH:mm:ss picture lives in
        # _DATE_PARTS, plain time pictures in _TIME_PARTS)
        frac_digits = 0
        fm = _FRACTION_FMT_RE.match(date_format) if date_format else None
        if fm:
            frac_digits, date_format = len(fm.group("fr")), fm.group("rest")
        fm = _FRACTION_FMT_RE.match(time_format) if time_format else None
        if fm:
            frac_digits, time_format = len(fm.group("fr")), fm.group("rest")

        frac = ""

        def _take_fraction(rest: str) -> str:
            """Consume '.ddd' (exact digit count) after the seconds match;
            on mismatch record a format error like the part matchers."""
            nonlocal frac
            m = re.match(r"^\.(\d{%d})(?!\d)" % frac_digits, rest)
            if not m:
                errors.append(
                    f"{rest or value} does not match fractional-second "
                    f"format .{'S' * frac_digits}")
                return rest
            frac = "." + m.group(1)
            return rest[m.end():]

        date_part = None
        if date_format is not None:
            rx = _DATE_PARTS.get(date_format)
            if rx is None:
                errors.append(f"unrecognized date/time format {date_format}")
            else:
                date_part = rx.match(value)
        if date_part:
            value = value[date_part.end():]
            if frac_digits and "hr" in date_part.groupdict():
                value = _take_fraction(value)
            if value.startswith(" "):
                value = value.lstrip()

        time_part = None
        if time_format is not None:
            rx = _TIME_PARTS.get(time_format)
            if rx is None:
                errors.append(f"unrecognized date/time format {time_format}")
            else:
                time_part = rx.match(value)
        if time_part:
            value = value[time_part.end():]
            if frac_digits:
                value = _take_fraction(value)

        if date_part and "hr" in date_part.groupdict() and date_part.group("hr") is not None:
            time_part = date_part

        if tz and tz.startswith(" "):
            value = value.lstrip()
        if not tz and value and (date_part or time_part):
            # picture matched a prefix but unmatched characters remain and
            # no timezone picture could absorb them — a format mismatch,
            # never a silent truncation ('12:00:00XYZ' vs HH:mm:ss)
            errors.append(f"{orig_value} does not match format {orig_fmt}")
            return None
        tz_part = value if tz else ""

        vd = vt = None
        if date_part:
            vd = "%04d-%02d-%02d" % (int(date_part["yr"]), int(date_part["mo"]), int(date_part["da"]))
        if time_part:
            se = time_part["se"]
            vt = "%02d:%02d:%02d" % (int(time_part["hr"]), int(time_part["mi"]), int(se) if se else 0)
            vt += frac
        value = "T".join([p for p in (vd, vt) if p is not None]) + tz_part

    key = "dateTime" if base == "datetime" else base
    if not _lexical_valid(key, value):
        errors.append(f"{value} is not a valid {base}")
        return None
    return CellValue(value, DATATYPE_IRIS[base], None)


def _temporal(v) -> object:
    """ISO lexical → comparable datetime/time (None if unparseable). A bare
    date becomes midnight so date facets bound dateTime cells correctly."""
    import datetime as _dt
    s = str(v).strip().replace("Z", "+00:00")
    try:
        if "T" in s or (" " in s and ":" in s):
            return _dt.datetime.fromisoformat(s.replace(" ", "T", 1))
        if ":" in s:
            return _dt.time.fromisoformat(s)
        d = _dt.date.fromisoformat(s)
        return _dt.datetime(d.year, d.month, d.day)
    except ValueError:
        return None


def _cmp_temporal(a, b):
    """-1/0/1, or None when the shapes are incomparable. A naive side is
    assumed UTC when the other carries an offset (XSD's implicit-timezone
    comparison would make it indeterminate; UTC is the least-surprising
    determinization and keeps the check total)."""
    import datetime as _dt
    is_time = isinstance(a, _dt.time) and not isinstance(a, _dt.datetime)
    other_time = isinstance(b, _dt.time) and not isinstance(b, _dt.datetime)
    if is_time != other_time:
        return None
    if (a.tzinfo is None) != (b.tzinfo is None):
        utc = _dt.timezone.utc
        a = a.replace(tzinfo=a.tzinfo or utc)
        b = b.replace(tzinfo=b.tzinfo or utc)
    return (a > b) - (a < b)


def _check_range(lexical: str, dt: dict, base: str, errors: list[str]) -> None:
    """minimum/maximum/(min|max)(In|Ex)clusive facets (CSVW §5.11.2).

    The reference only validates the facet VALUES structurally
    (metadata.rb:554-559) and never compares cells against them — the W3C
    spec mandates the data-tier check, so this goes beyond the reference.
    Numerics compare as Decimal; date/time compare as parsed temporals
    (timezone offsets normalized — a lexicographic compare would mis-order
    '…09:00Z' vs '…10:00+05:00')."""
    lo_inc = dt.get("minimum", dt.get("minInclusive"))
    hi_inc = dt.get("maximum", dt.get("maxInclusive"))
    lo_exc = dt.get("minExclusive")
    hi_exc = dt.get("maxExclusive")
    if lo_inc is None and hi_inc is None and lo_exc is None and hi_exc is None:
        return
    from decimal import Decimal, InvalidOperation
    if base in NUMERIC_BASES:
        try:
            v = Decimal(lexical)
        except InvalidOperation:
            return  # NaN/INF: range facets do not apply

        def cmp(f):
            try:
                w = Decimal(str(f))
            except InvalidOperation:
                return None  # malformed facet: structural validation's concern
            return (v > w) - (v < w)
    elif base in DATE_BASES:
        tv = _temporal(lexical)
        if tv is None:
            return

        def cmp(f):
            w = _temporal(f)
            return None if w is None else _cmp_temporal(tv, w)
    else:
        return
    c = cmp(lo_inc) if lo_inc is not None else None
    if c is not None and c < 0:
        errors.append(f"{lexical} is less than the minimum {lo_inc}")
    c = cmp(hi_inc) if hi_inc is not None else None
    if c is not None and c > 0:
        errors.append(f"{lexical} is greater than the maximum {hi_inc}")
    c = cmp(lo_exc) if lo_exc is not None else None
    if c is not None and c <= 0:
        errors.append(
            f"{lexical} must be greater than the exclusive minimum {lo_exc}")
    c = cmp(hi_exc) if hi_exc is not None else None
    if c is not None and c >= 0:
        errors.append(
            f"{lexical} must be less than the exclusive maximum {hi_exc}")


def value_matching_datatype(value: str, dt: dict, lang: Optional[str]) -> tuple[Optional[CellValue], list[str]]:
    """→ (CellValue | None, errors). None ⇒ no match, fall back to plain literal."""
    errors: list[str] = []
    base = dt.get("base", "string")

    if dt.get("length") is not None and len(value) != dt["length"]:
        errors.append(f"{value} does not have length {dt['length']}")
    if dt.get("minLength") is not None and len(value) < dt["minLength"]:
        errors.append(f"{value} does not have length >= {dt['minLength']}")
    if dt.get("maxLength") is not None and len(value) > dt["maxLength"]:
        errors.append(f"{value} does not have length <= {dt['maxLength']}")

    if base in NUMERIC_BASES:
        cv = _match_numeric(value, dt, base, errors)
    elif base == "boolean":
        cv = _match_boolean(value, dt, errors)
    elif base in DATE_BASES:
        cv = _match_datetime(value, dt, base, errors)
    elif base in DURATION_BASES:
        cv = CellValue(value, DATATYPE_IRIS[base], None)
        if not _lexical_valid(base, value):
            errors.append(f"{value} is not a valid {base}")
            cv = None
    elif base in REJECTED_TYPES:
        errors.append(f"{value} uses unsupported datatype: {base}")
        cv = None
    else:
        fmt = dt.get("format")
        if fmt is not None and not re.search(str(fmt), value):
            errors.append(f"{value} does not match format {fmt}")
        cv = None
        if not errors:
            if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", base):
                # custom datatype: any absolute URI is a legal base
                # (reference metadata.rb:669) — emitted verbatim as the
                # literal's datatype, no lexical rules to apply
                cv = CellValue(value, base, None)
            else:
                iri = DATATYPE_IRIS.get(base, XSD + base)
                if base in STRING_FAMILY and iri == XSD + "string" \
                        or base == "string":
                    cv = CellValue(value, None, lang)
                else:
                    cv = CellValue(value, iri, None)
                    if not _lexical_valid(base, value):
                        errors.append(f"{value} is not a valid {base}")
                        cv = None

    if cv is not None and cv.lexical is not None and not errors:
        _check_range(cv.lexical, dt, base, errors)
    if cv is not None and errors:
        # constraint (length/pattern/range) errors invalidate even a
        # parseable value
        cv = None
    if cv is not None and isinstance(dt.get("@id"), str):
        # W3C-final derived datatypes: `@id` names the literal's datatype
        # IRI while `base` still governs parsing/facets (csvw metadata
        # §5.11.2 'id annotation'; absent from the draft-era reference)
        cv = CellValue(cv.lexical, dt["@id"], None)
    return cv, errors
