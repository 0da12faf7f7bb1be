"""Public-suffix-aware domain extraction (F13).

The reference ships the full Mozilla Public Suffix List baked into
``utils/DomainUtils.java`` (2,202 lines) so that registered-domain
extraction is correct for multi-label suffixes (``bbc.co.uk`` →
``bbc.co.uk``, not ``co.uk``). Embedding the whole PSL here would be
padding; instead this module carries a curated subset of the most common
multi-label public suffixes (all public knowledge, same data the PSL
publishes) plus ``load_psl()`` to ingest a full ``public_suffix_list.dat``
file when one is available on the cluster.

Both the Spark expressions and their DuckDB twins implement the same rule:

    parts  = host split on '.'
    suffix = last-2 labels if they form a known multi-label public suffix,
             else the last label
    registered_domain = suffix plus one more label to its left

Wildcard PSL rules (``*.ck``) and exceptions (``!www.ck``) are out of
scope for the builtin subset and documented as such in ``load_psl``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Curated multi-label (2-level) public suffixes — the high-traffic subset
# of the PSL's ccTLD registrations plus the CentralNic-style *.XX.com zones.
# Reference parity: utils/DomainUtils.java (full list); this is the subset
# a 100 TB web corpus hits most often.
PSL_2LEVEL: tuple[str, ...] = tuple(sorted({
    # United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "gen.nz", "geek.nz", "maori.nz",
    # Japan / Korea / China / Taiwan / Hong Kong / Singapore
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    # India / Southeast Asia
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "co.th", "or.th", "go.th", "ac.th", "in.th",
    "co.id", "or.id", "go.id", "ac.id", "sch.id", "web.id", "my.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "ac.vn",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    # Europe / Middle East / Africa
    "co.at", "or.at", "ac.at", "gv.at",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "k12.tr",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
    "co.ke", "or.ke", "go.ke", "ac.ke", "ne.ke",
    # CentralNic-style second-level zones under .com
    "eu.com", "gb.com", "uk.com", "us.com", "de.com", "jp.com",
    "cn.com", "br.com", "ru.com", "sa.com", "se.com", "za.com",
}))


def load_psl(path: str) -> tuple[str, ...]:
    """Parse a full ``public_suffix_list.dat`` into multi-label suffixes.

    Keeps exact rules with ≥2 labels (the 1-label rules are the trivial
    TLD fallback already handled); skips comments, blank lines, wildcard
    rules (``*.``) and exceptions (``!``) — documenting, not hiding, the
    simplification: wildcard zones (a handful of ccTLDs) fall back to
    last-2-labels. Pass the result as ``suffixes=`` to the extractors."""
    out: set[str] = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//") or line.startswith("!") or "*" in line:
                continue
            if "." in line:
                out.add(line.lower())
    return tuple(sorted(out))


def _last_labels(host: Column):
    parts = F.split(host, r"\.")
    last1 = F.try_element_at(parts, F.lit(-1))
    last2 = F.concat_ws(".", F.try_element_at(parts, F.lit(-2)), last1)
    last3 = F.concat_ws(".", F.try_element_at(parts, F.lit(-3)), last2)
    return F.size(parts), last1, last2, last3


def public_suffix(host: Column, suffixes: tuple[str, ...] = PSL_2LEVEL) -> Column:
    """Effective TLD of a hostname: the last 2 labels when they are a known
    multi-label public suffix, else the last label."""
    n, last1, last2, _ = _last_labels(host)
    return F.when((n >= 2) & last2.isin(*suffixes), last2).otherwise(last1)


def registered_domain(host: Column, suffixes: tuple[str, ...] = PSL_2LEVEL) -> Column:
    """eTLD+1: one label left of the public suffix (``www.bbc.co.uk`` →
    ``bbc.co.uk``; ``www.example.com`` → ``example.com``; a bare suffix or
    single-label host maps to itself)."""
    n, _, last2, last3 = _last_labels(host)
    return (
        F.when((n >= 3) & last2.isin(*suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def _duck_in_list(suffixes: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{s}'" for s in suffixes) + ")"


def duck_public_suffix(host_expr: str, suffixes: tuple[str, ...] = PSL_2LEVEL) -> str:
    """DuckDB twin of :func:`public_suffix` (same rule, same subset)."""
    parts = f"string_split({host_expr}, '.')"
    last2 = f"({parts}[-2] || '.' || {parts}[-1])"
    return (
        f"(CASE WHEN len({parts}) >= 2 AND {last2} IN {_duck_in_list(suffixes)} "
        f"THEN {last2} ELSE {parts}[-1] END)"
    )


def duck_registered_domain(host_expr: str, suffixes: tuple[str, ...] = PSL_2LEVEL) -> str:
    """DuckDB twin of :func:`registered_domain`."""
    parts = f"string_split({host_expr}, '.')"
    last2 = f"({parts}[-2] || '.' || {parts}[-1])"
    last3 = f"({parts}[-3] || '.' || {parts}[-2] || '.' || {parts}[-1])"
    return (
        f"(CASE WHEN len({parts}) >= 3 AND {last2} IN {_duck_in_list(suffixes)} "
        f"THEN {last3} WHEN len({parts}) >= 2 THEN {last2} "
        f"ELSE {host_expr} END)"
    )
