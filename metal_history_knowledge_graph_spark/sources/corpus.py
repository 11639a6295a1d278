"""Seeded synthetic Common-Crawl-style corpus with known ground truth.

Generates the input-hint pages table ``(url, warc_ts, html, text,
lang)`` (repo BASELINE.json) from the gazetteer, using sentence
templates that the pattern extractor parses — so the exact triple set
each page implies is known at generation time and P/R vs the pipeline
output is measurable (the north rule's ≥0.95 gate).

Page content is modeled on the reference's own test corpus
(``tests/integration/test_end_to_end_pipeline.py:33-81``,
``tests/fixtures/ground_truth_data.json:7-231``): the five ground-truth
fixture texts are embedded verbatim as pages 0-4, and one page carries
the classic alias-variant trio ("Black Sabath" / "BLACK SABBATH").

Determinism: everything is a pure function of (seed, page_id); the
Spark path generates pages distributively with ``mapInPandas`` over
``spark.range`` — embarrassingly parallel, no shuffle, and the SAME
rows at any partitioning (this is what makes two-cluster-size runs
comparable).

Skew by construction: ~15% of band-profile sections are about Black
Sabbath — the hot key that the salted aggregation path must survive.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from ..functions.gazetteer import (
    ALBUMS,
    BANDS,
    CHARACTERISTICS,
    CULTURAL_EVENTS,
    EQUIPMENT,
    GENRE_EVOLUTION,
    GENRE_ORIGINS,
    INFLUENCES,
    MEDIA_OUTLETS,
    MOVEMENTS,
    PEOPLE,
    PLATFORMS,
    PRODUCER_BY_ALBUM,
    PRODUCTION_STYLES,
    ROLE_BY_INSTRUMENT,
    SONGS,
    SUBGENRES,
    VENUES,
    VIRAL_PHENOMENA,
    era_of,
)
from ..functions.html_text import render_html

HOT_BAND = "Black Sabbath"
HOT_PROB = 0.15
MISSPELL_PROB = 0.12

_BASE_TS = datetime(2024, 3, 1, 0, 0, 0)

#: fixture texts from the reference ground truth
#: (tests/fixtures/ground_truth_data.json:9-231), embedded verbatim.
FIXTURE_TEXTS: list[tuple[str, list[tuple]]] = [
    (
        "Black Sabbath formed in Birmingham, England in 1968. The band consisted of "
        "Tony Iommi on guitar, Geezer Butler on bass, Bill Ward on drums, and Ozzy "
        "Osbourne on vocals.",
        [
            ("FORMED_IN", "band", "Black Sabbath", "location", "Birmingham"),
            ("MEMBER_OF", "person", "Tony Iommi", "band", "Black Sabbath"),
            ("MEMBER_OF", "person", "Geezer Butler", "band", "Black Sabbath"),
            ("MEMBER_OF", "person", "Bill Ward", "band", "Black Sabbath"),
            ("MEMBER_OF", "person", "Ozzy Osbourne", "band", "Black Sabbath"),
        ],
    ),
    (
        "Iron Maiden was formed in Leyton, East London, on Christmas Day 1975 by "
        "bassist Steve Harris. Their self-titled debut album 'Iron Maiden' was "
        "released in 1980.",
        [
            ("FORMED_IN", "band", "Iron Maiden", "location", "Leyton"),
            ("MEMBER_OF", "person", "Steve Harris", "band", "Iron Maiden"),
            ("RELEASED", "band", "Iron Maiden", "album", "Iron Maiden"),
        ],
    ),
    (
        "Metallica released 'Master of Puppets' in 1986, their third studio album. "
        "The album is widely considered one of the greatest thrash metal albums of "
        "all time.",
        [("RELEASED", "band", "Metallica", "album", "Master of Puppets")],
    ),
    (
        "The New Wave of British Heavy Metal (NWOBHM) movement began in the late "
        "1970s and included bands like Iron Maiden, Def Leppard, and Saxon.",
        [
            ("PART_OF_MOVEMENT", "band", "Iron Maiden", "movement", "New Wave of British Heavy Metal"),
            ("PART_OF_MOVEMENT", "band", "Def Leppard", "movement", "New Wave of British Heavy Metal"),
            ("PART_OF_MOVEMENT", "band", "Saxon", "movement", "New Wave of British Heavy Metal"),
        ],
    ),
    (
        "In 1981, Ozzy Osbourne left Black Sabbath to pursue a solo career. He was "
        "replaced by Ronnie James Dio, formerly of Rainbow.",
        [
            ("MEMBER_OF", "person", "Ozzy Osbourne", "band", "Black Sabbath"),
            ("MEMBER_OF", "person", "Ronnie James Dio", "band", "Black Sabbath"),
            ("MEMBER_OF", "person", "Ronnie James Dio", "band", "Rainbow"),
        ],
    ),
]

_BAND_NAMES = sorted(BANDS)
_PEOPLE_BY_BAND: dict[str, list[str]] = {}
for _p, _d in sorted(PEOPLE.items()):
    for _b in _d["bands"]:
        _PEOPLE_BY_BAND.setdefault(_b, []).append(_p)
_ALBUMS_BY_BAND: dict[str, list[str]] = {}
for _a, _d in sorted(ALBUMS.items()):
    _ALBUMS_BY_BAND.setdefault(_d["artist"], []).append(_a)
_SONGS_BY_ALBUM: dict[str, list[str]] = {}
for _s, _d in sorted(SONGS.items()):
    _SONGS_BY_ALBUM.setdefault(_d["album"], []).append(_s)

_FILLER_BITS = [
    "the scene grew steadily through those years",
    "local venues booked louder and heavier acts each month",
    "tape trading spread the sound far beyond its home town",
    "fanzines chronicled every demo and club show in detail",
    "the records sold modestly at first but endured for decades",
    "critics were slow to catch on while audiences were not",
    "the sound grew darker, faster and more technical over time",
    "radio ignored the movement almost entirely",
    "independent record shops became meeting points for the faithful",
    "touring conditions were rough and the vans were always breaking down",
]
_HEDGES = ["some say ", "allegedly ", "reportedly ", ""]


def _surface(rng: random.Random, canonical: str, entry: dict) -> str:
    """Render a band/person name, occasionally as a misspelling (never
    recorded in truth — the canonicalizer must repair it)."""
    miss = entry.get("misspellings") or []
    if miss and rng.random() < MISSPELL_PROB:
        return rng.choice(miss)
    return canonical


def _filler(rng: random.Random, n: int, hedged: bool = False) -> list[str]:
    out = []
    for _ in range(n):
        bit = rng.choice(_FILLER_BITS)
        hedge = rng.choice(_HEDGES) if hedged else ""
        out.append((hedge + bit).capitalize() + ".")
    return out


def _band_profile(rng: random.Random, truth: list) -> list[str]:
    """One '## Band' section: formation + members + genre (+ releases,
    + influences), every sentence parseable by functions/patterns.py."""
    band = HOT_BAND if rng.random() < HOT_PROB else rng.choice(_BAND_NAMES)
    b = BANDS[band]
    blocks = [f"## {band}"]

    sents = [
        f"{_surface(rng, band, b)} formed in {b['origin_city']}, "
        f"{b['origin_country']} in {b['formed_year']}."
    ]
    truth.append(("FORMED_IN", "band", band, "location", b["origin_city"]))
    members = _PEOPLE_BY_BAND.get(band, [])
    if members:
        picks = members[: rng.randint(1, min(4, len(members)))]
        parts = ", ".join(
            f"{_surface(rng, p, PEOPLE[p])} on {PEOPLE[p]['instruments'][0]}" for p in picks
        )
        sents.append(f"The band consisted of {parts}.")
        for p in picks:
            truth.append(("MEMBER_OF", "person", p, "band", band))
    genre = rng.choice(b["genres"])
    sents.append(f"{band} plays {genre}.")
    truth.append(("PLAYS_GENRE", "band", band, "subgenre", genre))
    # enhanced-schema color: gear, venues, platforms
    if rng.random() < 0.3:
        equip = rng.choice(sorted(EQUIPMENT))
        sents.append(f"{band} recorded with the {equip}.")
        truth.append(("USES_EQUIPMENT", "band", band, "equipment", equip))
    if rng.random() < 0.3:
        venue = rng.choice(sorted(VENUES))
        sents.append(f"{band} played at {venue}.")
        truth.append(("VENUE_HOSTED", "venue", venue, "band", band))
    if rng.random() < 0.25:
        platform = rng.choice(sorted(PLATFORMS))
        sents.append(f"{band} was promoted on {platform}.")
        truth.append(("PROMOTED_ON", "band", band, "platform", platform))
    # full base-whitelist color: eras, press, festivals, techniques,
    # scene attribution, citations
    if rng.random() < 0.25:
        era = era_of(b["formed_year"])
        if era:
            sents.append(f"{band} was active during the {era}.")
            truth.append(("ACTIVE_DURING", "band", band, "era", era))
    if rng.random() < 0.2:
        outlet = rng.choice(MEDIA_OUTLETS)
        sents.append(f"{band} was documented in {outlet}.")
        truth.append(("DOCUMENTED_IN", "band", band, "media_outlet", outlet))
    if rng.random() < 0.2:
        cev = rng.choice(CULTURAL_EVENTS)
        if rng.random() < 0.5:
            sents.append(f"{band} participated in {cev}.")
            truth.append(("PARTICIPATED_IN", "band", band, "event", cev))
        else:
            sents.append(f"{band} heavily shaped {cev}.")
            truth.append(("INFLUENCED_EVENT", "band", band, "event", cev))
    if rng.random() < 0.2:
        char = rng.choice(CHARACTERISTICS)
        sents.append(f"{band} uses {char}.")
        truth.append(("USES_TECHNIQUE", "band", band, "characteristic", char))
    if rng.random() < 0.15:
        sents.append(f"The {b['origin_city']} scene spawned {band}.")
        truth.append(("SCENE_SPAWNED", "location", b["origin_city"], "band", band))
    if rng.random() < 0.15:
        cited = rng.choice(sorted(a for a, d in ALBUMS.items() if d["artist"] != band))
        sents.append(f"{band} cited '{cited}' as a formative record.")
        truth.append(("CITATION", "band", band, "album", cited))
    sents.extend(_filler(rng, rng.randint(0, 2)))
    blocks.append(" ".join(sents))

    albums = _ALBUMS_BY_BAND.get(band, [])
    if albums and rng.random() < 0.8:
        album = rng.choice(albums)
        a = ALBUMS[album]
        sents = [f"{band} released '{album}' in {a['release_year']}."]
        truth.append(("RELEASED", "band", band, "album", album))
        if rng.random() < 0.6:
            sents.append(f"'{album}' was recorded at {a['studio']}.")
            truth.append(("RECORDED_AT", "album", album, "studio", a["studio"]))
        if rng.random() < 0.6:
            sents.append(f"'{album}' was released by {a['label']}.")
            truth.append(("RELEASED_BY", "album", album, "label", a["label"]))
        songs = _SONGS_BY_ALBUM.get(album, [])
        if songs and rng.random() < 0.6:
            song = rng.choice(songs)
            sents.append(f"'{album}' features the track '{song}'.")
            truth.append(("CONTAINS_TRACK", "album", album, "song", song))
            if rng.random() < 0.3:
                phen = rng.choice(VIRAL_PHENOMENA)
                sents.append(f"'{song}' went viral through the {phen}.")
                truth.append(("WENT_VIRAL", "song", song,
                              "viral_phenomenon", phen))
        producer = PRODUCER_BY_ALBUM.get(album)
        if producer and rng.random() < 0.5:
            sents.append(f"'{album}' was produced by {producer}.")
            truth.append(("PRODUCED", "person", producer, "album", album))
        if rng.random() < 0.25:
            rep_genre = rng.choice(b["genres"])
            sents.append(f"'{album}' represents {rep_genre}.")
            truth.append(("REPRESENTS_GENRE", "album", album, "subgenre", rep_genre))
        if rng.random() < 0.2:
            outlet = rng.choice(MEDIA_OUTLETS)
            sents.append(f"'{album}' was featured in {outlet}.")
            truth.append(("FEATURED_IN", "album", album, "media_outlet", outlet))
        if rng.random() < 0.2:
            char = rng.choice(CHARACTERISTICS)
            sents.append(f"'{album}' showcases {char}.")
            truth.append(("ALBUM_FEATURES", "album", album, "characteristic", char))
        if members and rng.random() < 0.5:
            perf = rng.choice(members)
            instrument = PEOPLE[perf]["instruments"][0]
            sents.append(
                f"{_surface(rng, perf, PEOPLE[perf])} performed on '{album}' "
                f"playing {instrument}."
            )
            truth.append(("PERFORMED_ON", "person", perf, "album", album))
        if rng.random() < 0.3:
            style = rng.choice(sorted(PRODUCTION_STYLES))
            sents.append(f"'{album}' was produced with the {style} sound.")
            truth.append(("PRODUCED_WITH_STYLE", "album", album,
                          "production_style", style))
        sents.extend(_filler(rng, rng.randint(0, 2)))
        blocks.append(" ".join(sents))

    influences = [t for t in INFLUENCES if t[0] == band]
    if influences and rng.random() < 0.5:
        influenced, influencer = rng.choice(influences)
        sents = [f"{influenced} was influenced by {influencer}."]
        truth.append(("INFLUENCED_BY", "band", influenced, "band", influencer))
        sents.extend(_filler(rng, rng.randint(1, 2), hedged=True))
        blocks.append(" ".join(sents))
    return blocks


def _movement_section(rng: random.Random, truth: list) -> list[str]:
    movement = rng.choice(sorted(MOVEMENTS))
    m = MOVEMENTS[movement]
    bands = m["bands"][:3]
    listed = ", ".join(bands[:-1]) + " and " + bands[-1] if len(bands) > 1 else bands[0]
    sent = (
        f"The {movement} movement began in the late {m['start_decade']}s "
        f"and included bands like {listed}."
    )
    for band in bands:
        truth.append(("PART_OF_MOVEMENT", "band", band, "movement", movement))
    sents = [sent]
    if len(bands) >= 2 and rng.random() < 0.7:
        a, b = bands[0], bands[1]
        sents.append(f"{a} and {b} were contemporaries.")
        truth.append(("CONTEMPORARY_OF", "band", a, "band", b))
    if len(bands) >= 2 and rng.random() < 0.5:
        a, b = bands[-1], bands[0]
        sents.append(f"{a} was often mentioned alongside {b} in the press.")
        truth.append(("MENTIONED_WITH", "band", a, "band", b))
    return [f"## {movement}", " ".join(sents + _filler(rng, rng.randint(1, 3)))]


def _genre_section(rng: random.Random, truth: list) -> list[str]:
    genre = rng.choice(sorted(GENRE_ORIGINS))
    city, country = GENRE_ORIGINS[genre]
    sents = [f"In the beginning {genre} originated in {city}, {country}."]
    truth.append(("ORIGINATED_IN", "subgenre", genre, "location", city))
    evolutions = [e for e in GENRE_EVOLUTION if e[0] == genre]
    if evolutions and rng.random() < 0.7:
        g1, g2 = rng.choice(evolutions)
        sents.append(f"Later {g1} evolved into {g2}.")
        truth.append(("EVOLVED_INTO", "subgenre", g1, "subgenre", g2))
    if rng.random() < 0.4:
        era = era_of(SUBGENRES[genre]["era_start"]) if genre in SUBGENRES else None
        if era:
            sents.append(f"In time {genre} emerged during the {era}.")
            truth.append(("EMERGED_DURING", "subgenre", genre, "era", era))
    if rng.random() < 0.4:
        char = rng.choice(CHARACTERISTICS)
        sents.append(f"Typically {genre} is defined by {char}.")
        truth.append(("HAS_CHARACTERISTIC", "subgenre", genre,
                      "characteristic", char))
    if rng.random() < 0.3:
        sents.append(f"The {city} scene developed {genre}.")
        truth.append(("SCENE_DEVELOPED", "location", city, "subgenre", genre))
    sents.extend(_filler(rng, rng.randint(1, 3)))
    return [f"## The story of {genre}", " ".join(sents)]


def _deep_section(rng: random.Random, truth: list) -> list[str]:
    """A >1.5×chunk_size section with ### subsections — forces the
    chunker's subsection and paragraph-packing code paths."""
    blocks = [f"## Scene report {rng.randint(1, 999)}"]
    for _ in range(3):
        inner = _band_profile(rng, truth)
        blocks.append("### " + inner[0][3:])
        # Pad each paragraph to ≥520 chars: crosses the chunker's
        # 1.5×chunk_size subsection boundary AND guarantees no paragraph
        # can be dropped by the packer's min_chunk_size=500 tail rule
        # (text_splitter.py:254) — zero truth-recall loss by chunking.
        for para in inner[1:]:
            while len(para) < 520:
                para = para + " " + " ".join(_filler(rng, 2))
            blocks.append(para)
    return blocks


def build_page(page_id: int, seed: int = 42, profile: str = "default") -> dict:
    """Pure generator for one page: returns ``{url, warc_ts, html,
    text, lang, truth}``. ``truth`` is the page's implied triple list
    ``(pred, subj_type, subj_name, obj_type, obj_name)`` in canonical
    names (misspelled surfaces are never in truth).

    ``profile='heavy'`` emits Common-Crawl-weight pages (many sections,
    ~20-60 KB) so per-page extraction CPU dominates scheduler overhead
    — the regime used for scaling-efficiency measurement."""
    url = f"https://metal.example/docs/{page_id:08d}"
    warc_ts = _BASE_TS + timedelta(seconds=(page_id * 37) % 2_592_000)

    truth: list[tuple] = []
    if page_id < len(FIXTURE_TEXTS):
        fixture, fixture_truth = FIXTURE_TEXTS[page_id]
        text = "## History\n\n" + fixture
        truth = list(fixture_truth)
    else:
        rng = random.Random((seed << 32) + page_id)
        blocks: list[str] = []
        heavy = profile == "heavy"
        n_sections = rng.randint(6, 12) if heavy else rng.randint(1, 3)
        # cut points: band | movement | genre | deep
        cuts = (0.42, 0.50, 0.55) if heavy else (0.62, 0.74, 0.86)
        if not heavy and rng.random() < 0.04:
            # No-structure page → fixed-window fallback path.
            blocks.append(" ".join(_filler(rng, 30)))
        else:
            for _ in range(n_sections):
                roll = rng.random()
                if roll < cuts[0]:
                    blocks.extend(_band_profile(rng, truth))
                elif roll < cuts[1]:
                    blocks.extend(_movement_section(rng, truth))
                elif roll < cuts[2]:
                    blocks.extend(_genre_section(rng, truth))
                else:
                    blocks.extend(_deep_section(rng, truth))
        text = "\n\n".join(blocks)

    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": render_html(text),
        "text": text,
        "lang": "en",
        "truth": truth,
    }


# --- Spark-side generation (distributed, shuffle-free) --------------------

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
TRUTH_SCHEMA = ("url string, pred string, subj_type string, subj_name string, "
                "obj_type string, obj_name string")


def generate_pages(spark, n_pages: int, seed: int = 42,
                   partitions: int | None = None, profile: str = "default"):
    """Distributed pages DataFrame: ``spark.range`` → ``mapInPandas``
    (narrow; each task generates its id range independently)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [build_page(int(i), seed, profile) for i in pdf["id"]]
            yield pd.DataFrame(
                [{k: r[k] for k in ("url", "warc_ts", "html", "text", "lang")} for r in rows]
            )

    rng_df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def generate_truth(spark, n_pages: int, seed: int = 42,
                   partitions: int | None = None, profile: str = "default"):
    """The oracle triple set for the same (seed, n_pages) corpus."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                page = build_page(int(i), seed, profile)
                for pred, st, sn, ot, on in page["truth"]:
                    out.append(dict(url=page["url"], pred=pred, subj_type=st,
                                    subj_name=sn, obj_type=ot, obj_name=on))
            yield pd.DataFrame(out, columns=["url", "pred", "subj_type",
                                             "subj_name", "obj_type", "obj_name"])

    rng_df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=TRUTH_SCHEMA)
