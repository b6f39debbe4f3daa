"""Connection-string utilities — parity with the reference's
cluster_uri / url_parser helpers (include/kspp/utils/cluster_uri.h,
include/kspp/utils/url_parser.h; golden behavior pinned by
tests/test7_cluster_uri.cpp and tests/test7_url_vector.cpp).

These parse the multi-host connection strings every connector config
takes (zk://host:port,host:port/path, comma-separated broker lists,
IPv6 bracket authorities) — driver-side config plumbing, never a data
path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class ClusterUri:
    """scheme://authority[/path] where authority is a comma-separated
    host:port list (IPv6 hosts in brackets). Scheme is lowercased;
    ALL whitespace inside the authority is erased, even mid-element
    (cluster_uri.cpp:23 remove_if(isspace): "a b, c" -> "ab,c";
    test7_cluster_uri.cpp: "a, b ,c" -> "a,b,c")."""

    scheme: str
    authority: str
    path: str

    @classmethod
    def parse(cls, s: str, default_scheme: str = "") -> "ClusterUri | None":
        s = s.strip()
        if "://" in s:
            scheme, _, rest = s.partition("://")
            scheme = scheme.strip().lower()
        else:
            scheme, rest = default_scheme.lower(), s
        if not scheme or not rest:
            return None
        # the path starts at the first '/' OUTSIDE an IPv6 bracket
        depth = 0
        split_at = len(rest)
        for i, ch in enumerate(rest):
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            elif ch == "/" and depth == 0:
                split_at = i
                break
        authority_raw, path = rest[:split_at], rest[split_at:]
        # the reference erases ALL whitespace inside the authority
        # (cluster_uri.cpp:23 remove_if(isspace)), not just around the
        # comma-separated elements: "a b,c" -> "ab,c"
        authority_raw = re.sub(r"\s+", "", authority_raw)
        authority = ",".join(
            part for part in authority_raw.split(",") if part
        )
        if not authority:
            return None
        return cls(scheme=scheme, authority=authority, path=path)

    @property
    def good(self) -> bool:
        return bool(self.scheme and self.authority)

    def __str__(self) -> str:
        return f"{self.scheme}://{self.authority}{self.path}"


def split_url_list(s: str, default_scheme: str = "") -> list[ClusterUri]:
    """Split a comma-separated URL list into parsed ClusterUris
    (url_parser.h:split_url_list): each element is a FULL url (unlike
    cluster_uri, where commas join hosts of one authority); elements
    missing a scheme take `default_scheme`. Commas inside IPv6
    brackets do not split. Unparseable elements are dropped, matching
    the reference's good()-filter convention."""
    parts: list[str] = []
    depth = 0
    cur = []
    for ch in s:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = []
    for p in parts:
        if not p.strip():
            continue
        uri = ClusterUri.parse(p, default_scheme=default_scheme)
        if uri is not None and uri.good:
            out.append(uri)
    return out
