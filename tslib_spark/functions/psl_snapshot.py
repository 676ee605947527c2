"""Bundled Public-Suffix-List snapshot (two-label ICANN suffixes).

A subset of the Mozilla Public Suffix List (publicsuffix.org, MPL-2.0,
public data) covering the common two-label ICANN registry suffixes —
the cases the "last two labels" heuristic gets wrong (``co.uk``-style
registries where the registrable domain is three labels). A crawl
pipeline keyed on registrable domains hits these daily.

Deliberate scope limits, documented rather than hidden:
- two-label rules only (no ``*.ck`` wildcards, no ``pref.aichi.jp``-style
  three-label rules, no PRIVATE-section entries like ``github.io``);
  hosts not matching any rule here fall back to the last-two-labels
  heuristic, which is correct for every plain gTLD/ccTLD;
- the list is a static snapshot: swap this module's tuple for a fresh
  ``public_suffix_list.dat`` parse when currency matters.

The set is consumed as ONE codegen ``IN`` predicate (a literal hash set
in the JVM), so PSL matching stays a pure scalar expression — no Python
per row, no join, no shuffle (functions/web.py:url_domain_psl).
"""

from __future__ import annotations

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
