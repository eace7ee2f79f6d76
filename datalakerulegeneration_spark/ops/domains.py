"""Domain-grain curation: registered-domain extraction (public-suffix
rules), per-domain mix audits, per-domain caps, and URL blocklists.

The one production curation axis the corpus ops lacked (r7 verdict
item 5): CommonCrawl-style pipelines cap and block at the
REGISTERED-domain grain (eTLD+1 — ``forums.example.co.uk`` and
``www.example.co.uk`` are the same publisher), not the raw-host grain.
Everything here is JVM-side expression arithmetic — no UDFs, no
explode: suffix matching is a ``filter``/``array_max`` fold over a
literal rule array, so extraction rides the scan map-side and the only
shuffles are the grains the semantics require (one groupBy for the mix
audit, one domain-partitioned window for the cap).

Reference parity: the broadcast dictionary join of the reference's
US-cities rule (rules/evaluation.py:127-169) is the same shape as
:func:`blocklist_filter`'s blocklist dimension — a small curated list
joined against the corpus — lifted from city names to registered
domains (UT1/Blacklists-style blocklists are curated domain files).

Public-suffix rules: ``DEFAULT_SUFFIXES`` vendors a compact subset of
the Public Suffix List (publicsuffix.org — Mozilla's public, widely
vendored rule file) covering the common gTLDs, the major ccTLD
second-level registries, the usual shared-hosting suffixes, and the
PSL's wildcard registries. Production swaps in the full list by
passing ``suffixes=load_public_suffix_list(path)`` — the loader
parses the real publicsuffix.org file format (r9); DEFAULT_SUFFIXES
stays the compact in-repo fallback. The full PSL
rule grammar is implemented: normal rules (longest label-count match
wins), wildcard rules (``*.ck`` — one extra label belongs to the
suffix), exception rules (``!www.ck`` — overrides any wildcard; the
public suffix is the rule minus its leftmost label), and the implicit
``*`` rule for hosts matching nothing (public suffix = last label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops.sampling import _hash_bucket, _hash_bucket_sql

# Compact Public Suffix List subset (publicsuffix.org): normal rules
# only, lowercase, longest-match-wins semantics implemented below.
DEFAULT_SUFFIXES: tuple[str, ...] = (
    # gTLDs / common TLDs
    "com", "net", "org", "edu", "gov", "mil", "int", "info", "biz",
    "io", "ai", "dev", "app", "co", "me", "tv", "cc", "xyz", "site", "online",
    # country TLDs
    "uk", "de", "fr", "jp", "cn", "ru", "br", "in", "au", "ca", "it",
    "nl", "es", "se", "ch", "us", "nz", "za", "mx", "kr", "pl",
    # ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk", "plc.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "gov.in", "res.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr",
    "com.pl", "net.pl", "org.pl", "edu.pl",
    # shared-hosting / platform suffixes (private-domain section)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "netlify.app", "vercel.app", "pages.dev",
    "appspot.com", "cloudfront.net", "s3.amazonaws.com",
    # wildcard registries + their exceptions (the PSL rule grammar)
    "*.ck", "!www.ck", "*.bd", "*.er", "*.fk", "*.kh", "*.mm", "*.np", "*.pg",
)

# authority host of a URL: scheme required, userinfo/port/path stripped
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def _check_suffixes(suffixes) -> tuple[tuple[str, ...], tuple[str, ...], tuple[str, ...]]:
    """Validate and partition the rule list into (normals, wildcard
    bases, exceptions): ``*.ck`` contributes base ``ck``; ``!www.ck``
    contributes exception ``www.ck``. An exception must override some
    wildcard, so ``!x`` requires a ``*.<parent(x)>`` rule."""
    suf = tuple(suffixes) if suffixes is not None else DEFAULT_SUFFIXES
    if not suf:
        raise ValueError("suffixes must name at least one public-suffix rule")
    normals, wilds, excs = [], [], []
    for s in suf:
        body = s[2:] if s.startswith("*.") else s[1:] if s.startswith("!") else s
        if not body or any(c in body for c in "'\"\\ !*") or body != body.lower():
            raise ValueError(f"suffix rules must be lowercase and quote-free: {s!r}")
        if s.startswith("*."):
            wilds.append(body)
        elif s.startswith("!"):
            excs.append(body)
        else:
            normals.append(body)
    for e in excs:
        parent = e.split(".", 1)[1] if "." in e else ""
        if parent not in wilds:
            raise ValueError(
                f"exception rule !{e} has no matching wildcard rule *.{parent or '?'}"
            )
    if not normals:
        raise ValueError("suffixes must include at least one normal rule")
    return tuple(normals), tuple(wilds), tuple(excs)


def load_public_suffix_list(path: str, include_private: bool = True) -> tuple[str, ...]:
    """Parse a file in the REAL publicsuffix.org list format into the
    rule tuple every builder here accepts via ``suffixes=`` — the
    production path for swapping the compact vendored
    ``DEFAULT_SUFFIXES`` subset for the full ~10k-rule list (the same
    curated-dimension load shape as the reference's US-cities file,
    rules/evaluation.py:102-169).

    Format handled per the PSL spec: ``//`` comment lines; blank
    lines; the ``===BEGIN/END ICANN|PRIVATE DOMAINS===`` section
    markers (``include_private=False`` keeps only the ICANN section —
    registry suffixes without the github.io-style platform rules);
    each rule is the line up to the first whitespace; wildcard
    (``*.ck``) and exception (``!www.ck``) rules flow through
    unchanged into the existing grammar. Unicode (IDN) rules are kept
    as written — the PSL publishes U-labels; hosts arriving in
    punycode (``xn--``) match only if the caller pre-decodes them
    (full IDN mapping needs an idna codec, deliberately out of scope).
    Validation (lowercase, quote-free, exception↔wildcard pairing)
    happens in :func:`_check_suffixes` at build time, as for any
    caller-provided rule list."""
    rules: list[str] = []
    section: str | None = None
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            if line.startswith("//"):
                if "===BEGIN ICANN DOMAINS===" in line:
                    section = "icann"
                elif "===BEGIN PRIVATE DOMAINS===" in line:
                    section = "private"
                elif "===END" in line:
                    section = None
                continue
            if section == "private" and not include_private:
                continue
            rules.append(line.split()[0].lower())
    if not rules:
        raise ValueError(f"no rules parsed from {path!r} — not a PSL-format file?")
    return tuple(rules)


def _check_blocked(blocked_domains) -> tuple[str, ...]:
    """Validate the blocklist the way :func:`_check_suffixes` guards
    suffix rules — the entries are interpolated into the DuckDB oracle
    as string literals, so a quote (or a stray wildcard) would break
    or alter the generated SQL while the Spark side (createDataFrame)
    handled it fine, producing a spurious gate mismatch."""
    blocked = tuple(sorted(set(blocked_domains)))
    if not blocked:
        raise ValueError("blocked_domains must name at least one domain")
    for b in blocked:
        if not b or any(c in b for c in "'\"\\ !*") or b != b.lower():
            raise ValueError(
                f"blocked domains must be lowercase and quote/wildcard-free: {b!r}"
            )
    return blocked


def host_expr(url: str) -> str:
    """Spark SQL: lowercase authority host of ``url``, NULL when the
    value has no scheme://host shape; trailing dots stripped."""
    return (
        f"nullif(regexp_replace(regexp_extract(lower({url}), '{_HOST_RE}', 1),"
        f" '[.]+$', ''), '')"
    )


def host_sql_expr(url: str) -> str:
    """DuckDB twin of :func:`host_expr`."""
    return (
        f"nullif(regexp_replace(regexp_extract(lower({url}), '{_HOST_RE}', 1),"
        f" '[.]+$', ''), '')"
    )


def _nsuf_expr(host: str, rules) -> str:
    """Spark SQL: public-suffix LABEL COUNT for ``host`` under the PSL
    algorithm — exception rules win (suffix = rule minus its leftmost
    label), else the most-labels match among normal + wildcard rules
    (a wildcard ``*.b`` contributes labels(b)+1), else the implicit
    ``*`` rule (1). Two same-label-count matching rules are the same
    rule (both are suffixes of the host), so a numeric max suffices."""
    normals, wilds, excs = rules

    def match(s):
        return f"{host} = s OR endswith({host}, concat('.', s))"

    def labels(e):
        return f"size(split({e}, '[.]'))"

    narr = "array(" + ", ".join(f"'{s}'" for s in normals) + ")"
    nbest = (
        f"array_max(transform(filter({narr}, s -> {match('s')}), s -> {labels('s')}))"
    )
    parts = [f"coalesce({nbest}, 1)"]
    if wilds:
        warr = "array(" + ", ".join(f"'{b}'" for b in wilds) + ")"
        wbest = (
            f"array_max(transform(filter({warr}, s -> endswith({host},"
            f" concat('.', s))), s -> {labels('s')} + 1))"
        )
        parts.append(f"coalesce({wbest}, 1)")
    best = f"greatest({', '.join(parts)})" if len(parts) > 1 else parts[0]
    if excs:
        earr = "array(" + ", ".join(f"'{e}'" for e in excs) + ")"
        ebest = (
            f"array_max(transform(filter({earr}, s -> {match('s')}), s -> {labels('s')} - 1))"
        )
        return f"coalesce({ebest}, {best})"
    return best


def _nsuf_sql_expr(host: str, rules) -> str:
    """DuckDB twin of :func:`_nsuf_expr`."""
    normals, wilds, excs = rules

    def match(s):
        return f"{host} = s OR ends_with({host}, '.' || s)"

    def labels(e):
        return f"len(string_split({e}, '.'))"

    narr = "[" + ", ".join(f"'{s}'" for s in normals) + "]"
    nbest = (
        f"list_max(list_transform(list_filter({narr}, s -> {match('s')}), s -> {labels('s')}))"
    )
    parts = [f"COALESCE({nbest}, 1)"]
    if wilds:
        warr = "[" + ", ".join(f"'{b}'" for b in wilds) + "]"
        wbest = (
            f"list_max(list_transform(list_filter({warr}, s -> ends_with({host},"
            f" '.' || s)), s -> {labels('s')} + 1))"
        )
        parts.append(f"COALESCE({wbest}, 1)")
    best = f"greatest({', '.join(parts)})" if len(parts) > 1 else parts[0]
    if excs:
        earr = "[" + ", ".join(f"'{e}'" for e in excs) + "]"
        ebest = (
            f"list_max(list_transform(list_filter({earr}, s -> {match('s')}), s -> {labels('s')} - 1))"
        )
        return f"COALESCE({ebest}, {best})"
    return best


def _dom_expr(host: str, nsuf: str) -> str:
    """Spark SQL: registered domain (eTLD+1) of ``host`` given its
    public-suffix label count ``nsuf`` — NULL for non-DNS hosts (IP
    literals, bracketed IPv6) and for hosts that ARE a public suffix."""
    labels = f"split({host}, '[.]')"
    return f"""
case
  when {host} is null
    or not ({host} rlike '^[a-z0-9.-]+$')
    or {host} rlike '^[0-9.]+$' then null
  when size({labels}) <= {nsuf} then null
  else array_join(slice({labels}, -({nsuf} + 1), {nsuf} + 1), '.')
end""".strip()


def _dom_sql_expr(host: str, nsuf: str) -> str:
    """DuckDB twin of :func:`_dom_expr`."""
    labels = f"string_split({host}, '.')"
    return f"""
CASE
  WHEN {host} IS NULL
    OR NOT regexp_matches({host}, '^[a-z0-9.-]+$')
    OR regexp_matches({host}, '^[0-9.]+$') THEN NULL
  WHEN len({labels}) <= {nsuf} THEN NULL
  ELSE array_to_string(list_slice({labels}, -({nsuf} + 1), -1), '.')
END""".strip()


def with_registered_domain(
    df: DataFrame,
    url_col: str,
    out_col: str = "domain",
    suffixes=None,
) -> DataFrame:
    """``df`` plus a ``out_col`` column holding the registered domain
    (eTLD+1) of ``url_col`` — NULL when the URL is NULL/unparseable,
    the host is an IP literal, or the host is itself a public suffix.
    Pure map-side expression work: one regexp for the host, one
    literal-array longest-suffix fold, one slice — no UDF, no shuffle,
    so extraction fuses into whatever scan feeds it."""
    rules = _check_suffixes(suffixes)
    d = df.withColumn("_psl_host", F.expr(host_expr(url_col)))
    d = d.withColumn("_psl_nsuf", F.expr(_nsuf_expr("_psl_host", rules)))
    return d.withColumn(out_col, F.expr(_dom_expr("_psl_host", "_psl_nsuf"))).drop(
        "_psl_host", "_psl_nsuf"
    )


def _domain_cte_sql(table: str, url_col: str, suffixes) -> str:
    """DuckDB CTE body computing (t.*, domain) from ``table``."""
    rules = _check_suffixes(suffixes)
    host = host_sql_expr(url_col)
    nsuf = _nsuf_sql_expr("_psl_host", rules)
    dom = _dom_sql_expr("_psl_host", "_psl_nsuf")
    return f"""
  SELECT * EXCLUDE (_psl_host, _psl_nsuf), {dom} AS domain FROM (
    SELECT *, {nsuf} AS _psl_nsuf FROM (
      SELECT *, {host} AS _psl_host FROM {table}
    )
  )
""".strip()


def domain_mix(
    df: DataFrame, url_col: str, suffixes=None
) -> DataFrame:
    """Per-registered-domain corpus mix: ``(domain, n_docs, share)``.
    NULL-domain rows (no URL / IP host / bare public suffix) form
    their own audit row — a curation pipeline must SEE how much of the
    corpus has no domain attribution, not silently drop it. One
    groupBy; the share denominator rides an unpartitioned window over
    the #domains-row counts frame (bounded, the rebalance_groups
    pattern)."""
    d = with_registered_domain(df, url_col, "domain", suffixes)
    counts = d.groupBy("domain").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counts.select(
        "domain",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double")
            / F.nullif(F.sum("n_docs").over(wall).cast("double"), F.lit(0.0)),
            6,
        ).alias("share"),
    )


def domain_mix_sql(table: str, url_col: str, suffixes=None) -> str:
    """DuckDB oracle for :func:`domain_mix`."""
    return f"""
WITH doms AS (
{_domain_cte_sql(table, url_col, suffixes)}
),
counts AS (
  SELECT domain, CAST(count(*) AS BIGINT) AS n_docs FROM doms GROUP BY domain
)
SELECT domain, n_docs,
       round(CAST(n_docs AS DOUBLE) / nullif(CAST(sum(n_docs) OVER () AS DOUBLE), 0.0), 6) AS share
FROM counts
"""


def domain_cap(
    df: DataFrame,
    id_col: str,
    url_col: str,
    max_per_domain: int,
    salt: str = "domain_cap",
    suffixes=None,
) -> DataFrame:
    """Cap every registered domain at ``max_per_domain`` documents —
    the CommonCrawl-style guard against one publisher dominating the
    corpus. Survivors are the ``max_per_domain`` members with the
    smallest ``md5(salt:id)`` (deterministic hash order = an unbiased,
    engine-reproducible within-domain sample; ties by id), computed
    with ONE domain-partitioned window — Spark executes the rank ≤ N
    filter as WindowGroupLimit, a map-side partial top-N per domain,
    so no task ever holds more than N rows of a flooded domain.
    NULL-domain rows are a group like any other (capped together);
    exempt them by splitting on ``domain IS NULL`` upstream if
    unattributed docs must all survive. Returns ``df``'s columns.

    Absolute-count semantics on purpose: :func:`ops.sampling.
    rebalance_groups` caps by SHARE of the corpus (composable at this
    grain via ``with_registered_domain`` + ``rebalance_groups`` on the
    domain column); a blocklist-adjacent per-publisher cap is a fixed
    N regardless of corpus size."""
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    d = with_registered_domain(df, url_col, "_psl_dom", suffixes)
    w = Window.partitionBy("_psl_dom").orderBy(
        _hash_bucket(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        d.withColumn("_psl_rn", F.row_number().over(w))
        .where(F.col("_psl_rn") <= max_per_domain)
        .select(*df.columns)
    )


def domain_cap_sql(
    table: str,
    id_col: str,
    url_col: str,
    max_per_domain: int,
    salt: str = "domain_cap",
    suffixes=None,
    select_cols: str = "* EXCLUDE (domain, _psl_rn)",
) -> str:
    """DuckDB oracle for :func:`domain_cap`. The default
    ``select_cols`` drops the helper ``domain``/``_psl_rn`` columns so
    the SQL default matches the Spark op's contract (exactly the
    input table's columns)."""
    hb = _hash_bucket_sql(id_col, salt)
    return f"""
WITH doms AS (
{_domain_cte_sql(table, url_col, suffixes)}
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY domain ORDER BY {hb}, {id_col}
  ) AS _psl_rn
  FROM doms
)
SELECT {select_cols} FROM ranked WHERE _psl_rn <= {max_per_domain}
"""


def blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked_domains,
    suffixes=None,
) -> DataFrame:
    """Drop every document whose REGISTERED domain is on the blocklist
    — the UT1-style curated-list filter, at the grain blocklists are
    published at (blocking ``example.com`` blocks ``www.example.com``
    and ``cdn.example.com`` too). The blocklist is a broadcast
    dimension anti-joined against the corpus (the reference's
    US-cities dictionary join, rules/evaluation.py:127-169, lifted to
    domains) — a real UT1 category file is ~100k rows, comfortably
    broadcast. NULL-domain rows SURVIVE (nothing to match — blocklists
    name domains, not missing attribution). Returns ``df``'s columns.
    """
    blocked = _check_blocked(blocked_domains)
    d = with_registered_domain(df, url_col, "_psl_dom", suffixes)
    bl = df.sparkSession.createDataFrame([(b,) for b in blocked], "_blocked string")
    return (
        d.join(
            F.broadcast(bl), d["_psl_dom"] == F.col("_blocked"), "left_anti"
        ).select(*df.columns)
    )


def blocklist_filter_sql(
    table: str,
    url_col: str,
    blocked_domains,
    suffixes=None,
    select_cols: str = "* EXCLUDE (domain)",
) -> str:
    """DuckDB oracle for :func:`blocklist_filter`. The default
    ``select_cols`` drops the helper ``domain`` column so the SQL
    default matches the Spark op's contract (exactly ``df``'s
    columns)."""
    blocked = _check_blocked(blocked_domains)
    bl = ", ".join(f"'{b}'" for b in blocked)
    return f"""
WITH doms AS (
{_domain_cte_sql(table, url_col, suffixes)}
)
SELECT {select_cols} FROM doms
WHERE domain IS NULL OR domain NOT IN ({bl})
"""


# ---------------------------------------------------------------------------
# canonical URLs + URL-grain dedup
# ---------------------------------------------------------------------------

# tracking parameters dropped by canonicalization (the CommonCrawl /
# link-canonicalization standard set); a param matches by name prefix
# for utm_* and exact name otherwise
DEFAULT_DROP_PARAMS = ("utm_", "fbclid", "gclid", "ref")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _drop_param_re(drop_params) -> str:
    alts = []
    for p in drop_params:
        if any(c in p for c in "'\"\\ ()[]|"):
            raise ValueError(f"drop_params must be plain names/prefixes: {p!r}")
        alts.append(f"{p}[^=]*" if p.endswith("_") else p)
    return "^(" + "|".join(alts) + ")(=|$)"


def _canonical_steps(url: str, strip_www: bool, drop_params, duck: bool):
    """The shared normalization recipe as (intermediate exprs, final
    expr) — identical regexes both engines; only the list-function
    names differ."""
    drop_re = _drop_param_re(drop_params)
    filt = "list_filter" if duck else "filter"
    sort = "list_sort" if duck else "array_sort"
    join = "array_to_string" if duck else "array_join"
    split = "string_split" if duck else "split"
    match = (
        (lambda p, r: f"regexp_matches({p}, '{r}')")
        if duck
        else (lambda p, r: f"{p} rlike '{r}'")
    )
    scheme = f"lower(nullif(regexp_extract({url}, '{_SCHEME_RE}', 1), ''))"
    # strip "scheme://" (the full prefix; the capture-group parens in
    # _SCHEME_RE are harmless to regexp_replace)
    rest = f"regexp_replace({url}, '{_SCHEME_RE}', '')"
    auth = "regexp_replace(regexp_extract(_cu_rest, '^([^/?#]*)', 1), '^[^@]*@', '')"
    host = "regexp_replace(lower(regexp_replace(_cu_auth, ':[0-9]*$', '')), '[.]+$', '')"
    if strip_www:
        host = f"regexp_replace({host}, '^www[.]', '')"
    port = "nullif(regexp_extract(_cu_auth, ':([0-9]+)$', 1), '')"
    port_part = (
        "CASE WHEN _cu_port IS NULL THEN ''"
        " WHEN _cu_scheme = 'http' AND _cu_port = '80' THEN ''"
        " WHEN _cu_scheme = 'https' AND _cu_port = '443' THEN ''"
        " ELSE ':' || _cu_port END"
    )
    path = "regexp_extract(_cu_rest, '^[^/?#]*([^?#]*)', 1)"
    path_norm = (
        "CASE WHEN regexp_replace(_cu_path, '/+$', '') = '' THEN '/'"
        " ELSE regexp_replace(_cu_path, '/+$', '') END"
    )
    # strip the fragment BEFORE pulling the query: a '?' inside the
    # fragment (https://x.com/p#sec?x=1) is fragment content, not a
    # query string — extracting from the full URL leaked it into the
    # canonical key (r8 advice; both engines shared the bug, so oracle
    # parity hid it). [?] not \\? — Spark's default (non-ANSI-escape)
    # string literals eat the backslash, RE2 and java.util.regex both
    # accept the class; group 0 = whole match in both engines.
    nofrag = f"regexp_extract({url}, '^[^#]*', 0)"
    qs = "regexp_extract(_cu_nofrag, '[?]([^#]*)', 1)"
    params = (
        f"{filt}({split}(_cu_qs, '&'), p -> p <> '' AND NOT ({match('p', drop_re)}))"
        if duck
        else f"{filt}({split}(_cu_qs, '&'), p -> p != '' and not ({match('p', drop_re)}))"
    )
    # COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — an empty param list must canonicalize,
    # not NULL-poison the final concat
    qsort = f"coalesce({join}({sort}({params}), '&'), '')"
    final = (
        "CASE WHEN _cu_scheme IS NULL OR _cu_host IS NULL OR _cu_host = '' THEN NULL"
        " ELSE _cu_scheme || '://' || _cu_host || (" + port_part + ") || (" + path_norm + ")"
        " || (CASE WHEN _cu_q = '' THEN '' ELSE '?' || _cu_q END) END"
    )
    steps = [
        ("_cu_scheme", scheme),
        ("_cu_rest", rest),
        ("_cu_auth", auth),
        ("_cu_host", host),
        ("_cu_port", port),
        ("_cu_path", path),
        ("_cu_nofrag", nofrag),
        ("_cu_qs", qs),
        ("_cu_q", qsort),
    ]
    return steps, final


def with_canonical_url(
    df: DataFrame,
    url_col: str,
    out_col: str = "canonical_url",
    strip_www: bool = True,
    drop_params=DEFAULT_DROP_PARAMS,
) -> DataFrame:
    """``df`` plus the CANONICAL form of ``url_col`` — the URL-grain
    dedup key crawl pipelines normalize on before any content dedup:
    lowercase scheme+host (trailing dots stripped; leading ``www.``
    stripped when ``strip_www``), userinfo removed, default ports
    (http:80 / https:443) dropped, trailing path slashes collapsed
    (empty path → ``/``), fragment dropped, tracking query parameters
    removed (``drop_params``: prefix match for ``name_``-style
    entries, exact otherwise), surviving parameters sorted by byte
    order. NULL/unparseable/host-less URLs → NULL. Pure map-side
    expression work, no UDF.

    Collation note: parameter sorting is byte-order in both engines —
    identical for ASCII query strings (the practical case); exotic
    unicode parameter names could collate differently, in which case
    pre-normalize upstream."""
    steps, final = _canonical_steps(url_col, strip_www, drop_params, duck=False)
    d = df
    for name, expr in steps:
        d = d.withColumn(name, F.expr(expr))
    return d.withColumn(out_col, F.expr(final)).drop(*[n for n, _ in steps])


def _canonical_cte_sql(table: str, url_col: str, strip_www: bool, drop_params) -> str:
    steps, final = _canonical_steps(url_col, strip_www, drop_params, duck=True)
    inner = table
    for name, expr in steps:
        inner = f"(SELECT *, {expr} AS {name} FROM {inner})"
    cols = ", ".join(n for n, _ in steps)
    return f"SELECT * EXCLUDE ({cols}), {final} AS canonical_url FROM {inner}"


def url_dedup(
    df: DataFrame,
    id_col: str,
    url_col: str,
    strip_www: bool = True,
    drop_params=DEFAULT_DROP_PARAMS,
) -> DataFrame:
    """URL-grain dedup: keep the smallest-id document per CANONICAL
    URL (the stage crawl pipelines run before any content dedup —
    ``http://www.x.com/a?utm_source=y#f`` and ``https://x.com/a``
    differ, ``http://www.x.com/a/`` and ``http://x.com/a`` do not).
    Documents with no canonical URL (missing/unparseable) ALL survive
    — no-URL is not a duplicate key. Returns ``df``'s columns plus
    ``canonical_url``.

    Shape: canonicalization is map-side; the keeper choice is one
    canonical-partitioned window. NULL-canonical rows bypass the
    window entirely (filter + union) — they would otherwise pile into
    one skewed NULL partition."""
    d = with_canonical_url(df, url_col, "canonical_url", strip_www, drop_params)
    nulls = d.where(F.col("canonical_url").isNull())
    w = Window.partitionBy("canonical_url").orderBy(F.col(id_col).asc())
    kept = (
        d.where(F.col("canonical_url").isNotNull())
        .withColumn("_cu_rn", F.row_number().over(w))
        .where(F.col("_cu_rn") == 1)
        .drop("_cu_rn")
    )
    return nulls.unionByName(kept)


def url_dedup_sql(
    table: str,
    id_col: str,
    url_col: str,
    strip_www: bool = True,
    drop_params=DEFAULT_DROP_PARAMS,
    select_cols: str = "*",
) -> str:
    """DuckDB oracle for :func:`url_dedup`."""
    cte = _canonical_cte_sql(table, url_col, strip_www, drop_params)
    return f"""
WITH c AS ({cte})
SELECT {select_cols} FROM c WHERE canonical_url IS NULL
UNION ALL
SELECT {select_cols} FROM (
  SELECT *, row_number() OVER (PARTITION BY canonical_url ORDER BY {id_col}) AS _cu_rn
  FROM c WHERE canonical_url IS NOT NULL
) WHERE _cu_rn = 1
"""
