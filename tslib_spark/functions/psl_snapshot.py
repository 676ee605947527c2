"""Bundled Public-Suffix-List snapshot + a complete PSL rule engine.

The Mozilla Public Suffix List (publicsuffix.org, MPL-2.0, public data)
drives registrable-domain extraction. This module implements the FULL
matching algorithm from the spec — exact rules of any label count,
``*.`` wildcard rules, ``!`` exception rules (which beat everything),
longest-match precedence, the implicit ``*`` default rule, and the
ICANN/PRIVATE section split — over a bundled snapshot in the exact
``public_suffix_list.dat`` file format, so a complete fresh download can
be dropped into ``PSL_DAT`` verbatim when currency matters.

Snapshot scope (curated, documented): every two-label ICANN registry
suffix from the original bundle, the stable TLD-level wildcards
(``*.bd``, ``*.ck`` + ``!www.ck``, …), ``*.sch.uk``, the Japanese
prefecture/city structure exemplars (``pref.aichi.jp``-style three-label
rules, ``*.kawasaki.jp`` city wildcards with their ``!city.*``
exceptions), the US ``k12/cc/lib.<state>.us`` family, and the
highest-traffic PRIVATE-section hosts (``github.io``, ``blogspot.com``,
…). Hosts matching no rule fall back to the implicit default rule
(public suffix = the TLD), exactly as the spec prescribes.

Consumption stays pure codegen (functions/web.py): the parsed rules
become chained CASE + literal IN predicates over per-length label
extractions — no Python per row, no join, no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

TWO_LABEL_SUFFIXES: tuple[str, ...] = (
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz", "kiwi.nz",
    "maori.nz", "mil.nz", "net.nz", "org.nz", "school.nz",
    # Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # South Korea
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    # Brazil
    "adv.br", "com.br", "edu.br", "emp.br", "eng.br", "gov.br", "ind.br",
    "inf.br", "mil.br", "net.br", "org.br",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    # Mexico / Argentina / Colombia / Peru / Venezuela / Chile
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "net.ar", "org.ar",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co", "org.co",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "co.ve", "com.ve", "edu.ve", "gob.ve", "mil.ve", "net.ve", "org.ve",
    "gob.cl", "gov.cl", "mil.cl",
    # Turkey
    "av.tr", "bel.tr", "com.tr", "edu.tr", "gen.tr", "gov.tr", "k12.tr",
    "mil.tr", "net.tr", "org.tr", "pol.tr", "web.tr",
    # Taiwan / Hong Kong / Singapore / Malaysia
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    # Thailand / Vietnam / Indonesia / Philippines
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    "com.ph", "edu.ph", "gov.ph", "mil.ph", "net.ph", "ngo.ph", "org.ph",
    # Pakistan / Egypt / Saudi Arabia / Israel / UAE
    "biz.pk", "com.pk", "edu.pk", "fam.pk", "gob.pk", "gov.pk", "net.pk",
    "org.pk", "web.pk",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg", "net.eg",
    "org.eg", "sci.eg",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "pub.sa",
    "sch.sa",
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    # Ukraine / Poland / Russia-adjacent ccTLD registries
    "co.ua", "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.pl", "edu.pl", "gov.pl", "mil.pl", "net.pl", "org.pl",
    # Kenya / Nigeria / Ghana / Tanzania / Uganda
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "com.ng", "edu.ng", "gov.ng", "mil.ng", "mobi.ng", "name.ng",
    "net.ng", "org.ng", "sch.ng",
    "com.gh", "edu.gh", "gov.gh", "mil.gh", "org.gh",
    "ac.tz", "co.tz", "go.tz", "hotel.tz", "info.tz", "me.tz", "mil.tz",
    "mobi.tz", "ne.tz", "or.tz", "sc.tz", "tv.tz",
    "ac.ug", "co.ug", "com.ug", "go.ug", "ne.ug", "or.ug", "org.ug",
    "sc.ug",
)

# Rules beyond the two-label set, in public_suffix_list.dat syntax.
_EXTRA_ICANN_RULES = """
// TLD-level wildcards: every second-level name under these registries is
// itself a public suffix (third parties register at the third level)
*.bd
*.ck
!www.ck
*.er
*.fk
*.kh
*.mm
*.np
*.pg
// UK schools register under <school>.<authority>.sch.uk
*.sch.uk
// Japan geographic-type structure exemplars: prefecture-government
// three-label rules and the designated-city wildcards with their
// city-hall exceptions
pref.aichi.jp
pref.hokkaido.jp
pref.kyoto.jp
pref.okinawa.jp
pref.osaka.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// US locality structure: state codes plus the k12/cc/lib families
ca.us
ny.us
tx.us
wa.us
fl.us
k12.ca.us
k12.ny.us
k12.tx.us
k12.wa.us
k12.fl.us
cc.ca.us
cc.ny.us
lib.ca.us
lib.ny.us
"""

_PRIVATE_RULES = """
// Hosting platforms where mutually-untrusted parties register subdomains
github.io
githubusercontent.com
gitlab.io
blogspot.com
appspot.com
herokuapp.com
netlify.app
vercel.app
web.app
firebaseapp.com
azurewebsites.net
cloudfront.net
pages.dev
workers.dev
wixsite.com
s3.amazonaws.com
// Next tier of high-traffic PRIVATE hosts (r5 verdict #5): site builders,
// PaaS/static-hosting platforms, serverless runtimes, tunnels, object
// storage — all present in the upstream PRIVATE section
wordpress.com
myshopify.com
webflow.io
readthedocs.io
gitbook.io
glitch.me
repl.co
fly.dev
onrender.com
surge.sh
neocities.org
amplifyapp.com
azurestaticapps.net
cloudfunctions.net
run.app
deno.dev
supabase.co
hf.space
streamlit.app
ngrok.io
trycloudflare.com
r2.dev
"""

PSL_DAT: str = (
    "// curated snapshot of the Public Suffix List (publicsuffix.org, MPL-2.0)\n"
    "// ===BEGIN ICANN DOMAINS===\n"
    + "\n".join(TWO_LABEL_SUFFIXES)
    + _EXTRA_ICANN_RULES
    + "// ===END ICANN DOMAINS===\n"
    "// ===BEGIN PRIVATE DOMAINS===\n"
    + _PRIVATE_RULES
    + "// ===END PRIVATE DOMAINS===\n"
)


@dataclass(frozen=True)
class PslRules:
    """Parsed rule sets keyed by label count, ready for codegen.

    ``exact[k]``: k-label exact rules. ``wildcard[k]``: BASES of
    ``*.base`` rules where base has k labels (the matched suffix has
    k+1). ``exception[k]``: k-label exception rules — a match makes the
    public suffix the rule minus its leading label (k-1 labels)."""

    exact: dict[int, frozenset[str]] = field(default_factory=dict)
    wildcard: dict[int, frozenset[str]] = field(default_factory=dict)
    exception: dict[int, frozenset[str]] = field(default_factory=dict)

    @property
    def max_suffix_labels(self) -> int:
        lens = (
            list(self.exact)
            + [k + 1 for k in self.wildcard]
            + [k - 1 for k in self.exception]
        )
        return max(lens, default=1)


def parse_psl(dat: str, include_private: bool = True) -> PslRules:
    """Parse ``public_suffix_list.dat`` text per the spec: one rule per
    line, ``//`` comments, ``*.`` wildcards, ``!`` exceptions; the
    PRIVATE section is included unless ``include_private=False``."""
    exact: dict[int, set[str]] = {}
    wildcard: dict[int, set[str]] = {}
    exception: dict[int, set[str]] = {}
    in_private = False
    for raw in dat.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("//"):
            if "BEGIN PRIVATE DOMAINS" in line:
                in_private = True
            elif "END PRIVATE DOMAINS" in line:
                in_private = False
            continue
        if in_private and not include_private:
            continue
        rule = line.split()[0].lower()  # spec: rule ends at whitespace
        if rule.startswith("!"):
            body = rule[1:]
            exception.setdefault(body.count(".") + 1, set()).add(body)
        elif rule.startswith("*."):
            base = rule[2:]
            wildcard.setdefault(base.count(".") + 1, set()).add(base)
        else:
            exact.setdefault(rule.count(".") + 1, set()).add(rule)
    return PslRules(
        exact={k: frozenset(v) for k, v in exact.items()},
        wildcard={k: frozenset(v) for k, v in wildcard.items()},
        exception={k: frozenset(v) for k, v in exception.items()},
    )


@lru_cache(maxsize=4)
def bundled_rules(include_private: bool = True) -> PslRules:
    return parse_psl(PSL_DAT, include_private=include_private)


def registrable_domain_py(host: str, rules: PslRules | None = None) -> str | None:
    """Pure-Python reference of the PSL algorithm (the test oracle for the
    codegen expression): exception rules win outright, else the longest
    matching rule; default rule ``*``. Returns the public suffix + one
    label, or None when the host IS a public suffix (no registrable
    domain) or has too few labels."""
    if rules is None:
        rules = bundled_rules()
    labels = host.lower().split(".")
    n = len(labels)

    def last(k: int) -> str:
        return ".".join(labels[n - k :])

    suffix_len = None
    for k in sorted(rules.exception, reverse=True):
        if n >= k and last(k) in rules.exception[k]:
            suffix_len = k - 1
            break
    if suffix_len is None:
        best = 1  # implicit default rule "*"
        for k in rules.exact:
            if n >= k and last(k) in rules.exact[k] and k > best:
                best = k
        for k in rules.wildcard:
            if n >= k + 1 and last(k) in rules.wildcard[k] and k + 1 > best:
                best = k + 1
        suffix_len = best
    if n <= suffix_len:
        return None
    return last(suffix_len + 1)
