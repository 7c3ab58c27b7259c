"""RFC 3987 IRI-reference grammar validation (SURVEY.md §2b L-ops).

The reference validates every ``<...>`` IRIREF through the ``iref``
crate at lex time (`/root/reference/src/lexing.rs:450-452`,
``IriRefBuf::from_string`` → ``InvalidIriRef``) and every compact-IRI
expansion through ``Iri::new`` at build time (build.rs:149-159,
``InvalidCompactIriSuffix``).  This module re-expresses the same
acceptance rules as compiled regexes over the RFC 3987 grammar:

    IRI-reference  = IRI / irelative-ref
    IRI            = scheme ":" ihier-part [ "?" iquery ] [ "#" ifragment ]
    irelative-ref  = irelative-part [ "?" iquery ] [ "#" ifragment ]

with full iauthority (iuserinfo / ihost incl. IP-literal / port),
isegment charsets (iunreserved incl. ucschar planes, pct-encoded,
sub-delims), iquery (adds iprivate) and ifragment.  Pure functions —
safe in Ray task retries; compiled once at import (per worker).
"""

from __future__ import annotations

import re

# ucschar ranges (RFC 3987 §2.2)
_UCSCHAR = (
    " -퟿豈-﷏ﷰ-￯"
    "\U00010000-\U0001fffd\U00020000-\U0002fffd\U00030000-\U0003fffd"
    "\U00040000-\U0004fffd\U00050000-\U0005fffd\U00060000-\U0006fffd"
    "\U00070000-\U0007fffd\U00080000-\U0008fffd\U00090000-\U0009fffd"
    "\U000a0000-\U000afffd\U000b0000-\U000bfffd\U000c0000-\U000cfffd"
    "\U000d0000-\U000dfffd\U000e1000-\U000efffd"
)
_IPRIVATE = "-\U000f0000-\U000ffffd\U00100000-\U0010fffd"
_IUNRESERVED = "A-Za-z0-9\\-._~" + _UCSCHAR
_SUB_DELIMS = "!$&'()*+,;="
_PCT = "%[0-9A-Fa-f]{2}"

_SCHEME = "[A-Za-z][A-Za-z0-9+.\\-]*"

_DEC_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
_IPV4 = rf"{_DEC_OCTET}(?:\.{_DEC_OCTET}){{3}}"
_H16 = "[0-9A-Fa-f]{1,4}"
_LS32 = f"(?:{_H16}:{_H16}|{_IPV4})"
_IPV6 = (
    f"(?:(?:{_H16}:){{6}}{_LS32}"
    f"|::(?:{_H16}:){{5}}{_LS32}"
    f"|{_H16}?::(?:{_H16}:){{4}}{_LS32}"
    f"|(?:(?:{_H16}:)?{_H16})?::(?:{_H16}:){{3}}{_LS32}"
    f"|(?:(?:{_H16}:){{0,2}}{_H16})?::(?:{_H16}:){{2}}{_LS32}"
    f"|(?:(?:{_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}"
    f"|(?:(?:{_H16}:){{0,4}}{_H16})?::{_LS32}"
    f"|(?:(?:{_H16}:){{0,5}}{_H16})?::{_H16}"
    f"|(?:(?:{_H16}:){{0,6}}{_H16})?::)"
)
# IPvFuture keeps the ASCII `unreserved` set (RFC 3986 §3.2.2)
_IPVFUTURE = rf"[Vv][0-9A-Fa-f]+\.[A-Za-z0-9\-._~{_SUB_DELIMS}:]+"
_IP_LITERAL = rf"\[(?:{_IPV6}|{_IPVFUTURE})\]"
_IREG_NAME = f"(?:[{_IUNRESERVED}{_SUB_DELIMS}]|{_PCT})*"
_IHOST = f"(?:{_IP_LITERAL}|{_IREG_NAME})"
_IUSERINFO = f"(?:[{_IUNRESERVED}{_SUB_DELIMS}:]|{_PCT})*"
_IAUTHORITY = f"(?:{_IUSERINFO}@)?{_IHOST}(?::[0-9]*)?"

_IPCHAR = f"(?:[{_IUNRESERVED}{_SUB_DELIMS}:@]|{_PCT})"
_ISEG = f"{_IPCHAR}*"
_ISEG_NZ = f"{_IPCHAR}+"
_ISEG_NZ_NC = f"(?:[{_IUNRESERVED}{_SUB_DELIMS}@]|{_PCT})+"

_IPATH_ABEMPTY = f"(?:/{_ISEG})*"
_IPATH_ABSOLUTE = f"/(?:{_ISEG_NZ}(?:/{_ISEG})*)?"
_IPATH_ROOTLESS = f"{_ISEG_NZ}(?:/{_ISEG})*"
_IPATH_NOSCHEME = f"{_ISEG_NZ_NC}(?:/{_ISEG})*"

_IHIER_PART = (f"(?://{_IAUTHORITY}{_IPATH_ABEMPTY}"
               f"|{_IPATH_ABSOLUTE}|{_IPATH_ROOTLESS}|)")
_IRELATIVE_PART = (f"(?://{_IAUTHORITY}{_IPATH_ABEMPTY}"
                   f"|{_IPATH_ABSOLUTE}|{_IPATH_NOSCHEME}|)")

_IQUERY = f"(?:[{_IUNRESERVED}{_SUB_DELIMS}:@/?{_IPRIVATE}]|{_PCT})*"
_IFRAGMENT = f"(?:[{_IUNRESERVED}{_SUB_DELIMS}:@/?]|{_PCT})*"
_TAIL = f"(?:\\?{_IQUERY})?(?:#{_IFRAGMENT})?"

_IRI_RE = re.compile(f"^{_SCHEME}:{_IHIER_PART}{_TAIL}$")
_IRELATIVE_RE = re.compile(f"^{_IRELATIVE_PART}{_TAIL}$")


def is_valid_iri(s: str) -> bool:
    """Absolute IRI per RFC 3987 (scheme required) — the ``Iri::new``
    acceptance used for compact-IRI expansions (build.rs:149)."""
    return _IRI_RE.match(s) is not None


def is_valid_iri_ref(s: str) -> bool:
    """IRI-reference per RFC 3987 (IRI or irelative-ref) — the
    ``IriRefBuf::from_string`` acceptance used for every lexed
    ``<...>`` token (lexing.rs:450)."""
    return _IRI_RE.match(s) is not None or _IRELATIVE_RE.match(s) is not None
