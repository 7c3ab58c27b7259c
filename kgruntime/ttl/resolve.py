"""RFC 3986 §5 reference resolution for IRIs (SURVEY.md §2d, operator B4).

The reference resolves IRI references with the ``iref`` crate
(`/root/reference/src/build.rs:111-132`), which implements RFC 3986/3987
strict resolution.  ``urllib.parse.urljoin`` diverges on corner cases
(scheme allow-lists, empty-path handling), so this is a small, exact
implementation of RFC 3986 §5.2 used by the builder.  Pure function —
safe under Ray task retries.
"""

from __future__ import annotations

import re

_IRI_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?"  # scheme
    r"(?://([^/?#]*))?"                    # authority
    r"([^?#]*)"                            # path
    r"(?:\?([^#]*))?"                      # query
    r"(?:#(.*))?$",
    re.S,
)

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def split_iri(iri: str):
    m = _IRI_RE.match(iri)
    return m.groups()  # (scheme, authority, path, query, fragment)


def is_absolute(iri_ref: str) -> bool:
    """True when the reference carries a scheme (RFC 3986 §4.3)."""
    return _SCHEME_RE.match(iri_ref) is not None


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    if "." not in path:
        return path
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            if path.startswith("/"):
                i = path.find("/", 1)
            else:
                i = path.find("/")
            if i == -1:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _merge(base_authority, base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.3 merge."""
    if base_authority is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    if i == -1:
        return ref_path
    return base_path[: i + 1] + ref_path


def resolve(base: str, ref: str) -> str:
    """RFC 3986 §5.2.2 transform references (strict)."""
    r_scheme, r_auth, r_path, r_query, r_frag = split_iri(ref)
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)

    if r_scheme is not None:
        scheme, auth, path, query = r_scheme, r_auth, remove_dot_segments(r_path), r_query
    elif r_auth is not None:
        scheme, auth, path, query = b_scheme, r_auth, remove_dot_segments(r_path), r_query
    elif r_path == "":
        scheme, auth, path = b_scheme, b_auth, b_path
        query = r_query if r_query is not None else b_query
    else:
        scheme, auth = b_scheme, b_auth
        if r_path.startswith("/"):
            path = remove_dot_segments(r_path)
        else:
            path = remove_dot_segments(_merge(b_auth, b_path, r_path))
        query = r_query

    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if auth is not None:
        out.append("//" + auth)
    out.append(path)
    if query is not None:
        out.append("?" + query)
    if r_frag is not None:
        out.append("#" + r_frag)
    return "".join(out)
