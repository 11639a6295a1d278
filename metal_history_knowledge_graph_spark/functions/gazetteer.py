"""Gazetteer: the broadcast alias dictionary at the heart of mention
detection and entity linking.

The reference extracts entities with an LLM; per the north rule this
engine replaces that with a deterministic gazetteer + pattern chain
producing the same ``ExtractionResult`` schema
(reference ``src/extraction/extraction_schemas.py:10-98``). The
gazetteer doubles as the seed vocabulary for the synthetic corpus
generator (sources/corpus.py) — which is what makes ground-truth
triples knowable and P/R measurable.

``misspellings`` are deliberately *excluded* from the alias dictionary:
they are only ever discovered by the capitalized-phrase patterns and
must be merged into the canonical entity by the MinHash-LSH +
SequenceMatcher≥0.85 canonicalizer (reference
``src/pipeline/extraction_pipeline.py:46-61``) — that path is what the
dedup test fixtures exercise.

All data here is public music history; it is deliberately small (the
broadcast side of every linking join).
"""

from __future__ import annotations

# --- canonical entities -------------------------------------------------

BANDS: dict[str, dict] = {
    "Black Sabbath": dict(formed_year=1968, origin_city="Birmingham", origin_country="England",
                          genres=["heavy metal", "doom metal"], aliases=["Sabbath"],
                          misspellings=["Black Sabath", "Black Sabbeth"]),
    "Iron Maiden": dict(formed_year=1975, origin_city="Leyton", origin_country="England",
                        genres=["heavy metal"], aliases=[], misspellings=["Iron Maidens"]),
    "Judas Priest": dict(formed_year=1969, origin_city="Birmingham", origin_country="England",
                         genres=["heavy metal"], aliases=[], misspellings=["Judas Preist"]),
    "Metallica": dict(formed_year=1981, origin_city="Los Angeles", origin_country="United States",
                      genres=["thrash metal"], aliases=[], misspellings=["Metalica"]),
    "Megadeth": dict(formed_year=1983, origin_city="Los Angeles", origin_country="United States",
                     genres=["thrash metal"], aliases=[], misspellings=["Megadeath"]),
    "Slayer": dict(formed_year=1981, origin_city="Huntington Park", origin_country="United States",
                   genres=["thrash metal"], aliases=[], misspellings=[]),
    "Anthrax": dict(formed_year=1981, origin_city="New York City", origin_country="United States",
                    genres=["thrash metal"], aliases=[], misspellings=[]),
    "Motörhead": dict(formed_year=1975, origin_city="London", origin_country="England",
                      genres=["speed metal"], aliases=[], misspellings=["Motorhead"]),
    "Deep Purple": dict(formed_year=1968, origin_city="Hertford", origin_country="England",
                        genres=["hard rock"], aliases=[], misspellings=[]),
    "Led Zeppelin": dict(formed_year=1968, origin_city="London", origin_country="England",
                         genres=["hard rock"], aliases=[], misspellings=["Led Zepplin"]),
    "Def Leppard": dict(formed_year=1977, origin_city="Sheffield", origin_country="England",
                        genres=["heavy metal"], aliases=[], misspellings=["Def Lepard"]),
    "Saxon": dict(formed_year=1977, origin_city="Barnsley", origin_country="England",
                  genres=["heavy metal"], aliases=[], misspellings=[]),
    "Venom": dict(formed_year=1978, origin_city="Newcastle", origin_country="England",
                  genres=["black metal"], aliases=[], misspellings=[]),
    "Bathory": dict(formed_year=1983, origin_city="Stockholm", origin_country="Sweden",
                    genres=["black metal"], aliases=[], misspellings=[]),
    "Mayhem": dict(formed_year=1984, origin_city="Oslo", origin_country="Norway",
                   genres=["black metal"], aliases=[], misspellings=[]),
    "Death": dict(formed_year=1984, origin_city="Orlando", origin_country="United States",
                  genres=["death metal"], aliases=[], misspellings=[]),
    "Morbid Angel": dict(formed_year=1983, origin_city="Tampa", origin_country="United States",
                         genres=["death metal"], aliases=[], misspellings=[]),
    "Pantera": dict(formed_year=1981, origin_city="Arlington", origin_country="United States",
                    genres=["groove metal"], aliases=[], misspellings=["Panterra"]),
    "Sepultura": dict(formed_year=1984, origin_city="Belo Horizonte", origin_country="Brazil",
                      genres=["thrash metal"], aliases=[], misspellings=["Sepoltura"]),
    "Rainbow": dict(formed_year=1975, origin_city="Hertford", origin_country="England",
                    genres=["hard rock"], aliases=[], misspellings=[]),
    "Dream Theater": dict(formed_year=1985, origin_city="Boston", origin_country="United States",
                          genres=["progressive metal"], aliases=[], misspellings=["Dream Theatre"]),
    "Candlemass": dict(formed_year=1984, origin_city="Stockholm", origin_country="Sweden",
                       genres=["doom metal"], aliases=[], misspellings=[]),
    "Helloween": dict(formed_year=1984, origin_city="Hamburg", origin_country="Germany",
                      genres=["power metal"], aliases=[], misspellings=[]),
    "Accept": dict(formed_year=1976, origin_city="Solingen", origin_country="Germany",
                   genres=["heavy metal"], aliases=[], misspellings=[]),
    "Diamond Head": dict(formed_year=1976, origin_city="Stourbridge", origin_country="England",
                         genres=["heavy metal"], aliases=[], misspellings=[]),
}

PEOPLE: dict[str, dict] = {
    "Tony Iommi": dict(instruments=["guitar"], bands=["Black Sabbath"], misspellings=["Toni Iommi"]),
    "Geezer Butler": dict(instruments=["bass"], bands=["Black Sabbath"], misspellings=[]),
    "Bill Ward": dict(instruments=["drums"], bands=["Black Sabbath"], misspellings=[]),
    "Ozzy Osbourne": dict(instruments=["vocals"], bands=["Black Sabbath"], misspellings=["Ozzy Osborne"]),
    "Ronnie James Dio": dict(instruments=["vocals"], bands=["Black Sabbath", "Rainbow"], misspellings=[]),
    "Steve Harris": dict(instruments=["bass"], bands=["Iron Maiden"], misspellings=[]),
    "Bruce Dickinson": dict(instruments=["vocals"], bands=["Iron Maiden"], misspellings=["Bruce Dickenson"]),
    "Rob Halford": dict(instruments=["vocals"], bands=["Judas Priest"], misspellings=[]),
    "Glenn Tipton": dict(instruments=["guitar"], bands=["Judas Priest"], misspellings=[]),
    "James Hetfield": dict(instruments=["guitar", "vocals"], bands=["Metallica"], misspellings=[]),
    "Lars Ulrich": dict(instruments=["drums"], bands=["Metallica"], misspellings=[]),
    "Kirk Hammett": dict(instruments=["guitar"], bands=["Metallica"], misspellings=["Kirk Hammet"]),
    "Cliff Burton": dict(instruments=["bass"], bands=["Metallica"], misspellings=[]),
    "Dave Mustaine": dict(instruments=["guitar", "vocals"], bands=["Megadeth", "Metallica"], misspellings=[]),
    "Tom Araya": dict(instruments=["bass", "vocals"], bands=["Slayer"], misspellings=[]),
    "Kerry King": dict(instruments=["guitar"], bands=["Slayer"], misspellings=[]),
    "Lemmy Kilmister": dict(instruments=["bass", "vocals"], bands=["Motörhead"], misspellings=["Lemmy Kilminster"]),
    "Ritchie Blackmore": dict(instruments=["guitar"], bands=["Deep Purple", "Rainbow"], misspellings=[]),
    "Ian Gillan": dict(instruments=["vocals"], bands=["Deep Purple", "Black Sabbath"], misspellings=[]),
    "Robert Plant": dict(instruments=["vocals"], bands=["Led Zeppelin"], misspellings=[]),
    "Jimmy Page": dict(instruments=["guitar"], bands=["Led Zeppelin"], misspellings=[]),
    "Chuck Schuldiner": dict(instruments=["guitar", "vocals"], bands=["Death"], misspellings=["Chuck Schuldinger"]),
    "Quorthon": dict(instruments=["guitar", "vocals"], bands=["Bathory"], misspellings=[]),
    "Dimebag Darrell": dict(instruments=["guitar"], bands=["Pantera"], misspellings=[]),
    "Max Cavalera": dict(instruments=["guitar", "vocals"], bands=["Sepultura"], misspellings=[]),
    "Phil Anselmo": dict(instruments=["vocals"], bands=["Pantera"], misspellings=[]),
    "Kai Hansen": dict(instruments=["guitar", "vocals"], bands=["Helloween"], misspellings=[]),
    "Michael Kiske": dict(instruments=["vocals"], bands=["Helloween"], misspellings=[]),
}

ALBUMS: dict[str, dict] = {
    "Paranoid": dict(artist="Black Sabbath", release_year=1970, label="Vertigo Records",
                     studio="Regent Sound Studios"),
    "Master of Reality": dict(artist="Black Sabbath", release_year=1971, label="Vertigo Records",
                              studio="Island Studios"),
    "Heaven and Hell": dict(artist="Black Sabbath", release_year=1980, label="Vertigo Records",
                            studio="Criteria Studios"),
    "The Number of the Beast": dict(artist="Iron Maiden", release_year=1982, label="EMI Records",
                                    studio="Battery Studios"),
    "Powerslave": dict(artist="Iron Maiden", release_year=1984, label="EMI Records",
                       studio="Compass Point Studios"),
    "British Steel": dict(artist="Judas Priest", release_year=1980, label="Columbia Records",
                          studio="Tittenhurst Park"),
    "Screaming for Vengeance": dict(artist="Judas Priest", release_year=1982, label="Columbia Records",
                                    studio="Ibiza Sound Studios"),
    "Master of Puppets": dict(artist="Metallica", release_year=1986, label="Elektra Records",
                              studio="Sweet Silence Studios"),
    "Ride the Lightning": dict(artist="Metallica", release_year=1984, label="Megaforce Records",
                               studio="Sweet Silence Studios"),
    "Rust in Peace": dict(artist="Megadeth", release_year=1990, label="Capitol Records",
                          studio="Rumbo Recorders"),
    "Reign in Blood": dict(artist="Slayer", release_year=1986, label="Def Jam Recordings",
                           studio="Hit City West"),
    "Ace of Spades": dict(artist="Motörhead", release_year=1980, label="Bronze Records",
                          studio="Jacksons Studio"),
    "Machine Head": dict(artist="Deep Purple", release_year=1972, label="Purple Records",
                         studio="Grand Hotel"),
    "Painkiller": dict(artist="Judas Priest", release_year=1990, label="Columbia Records",
                       studio="Miraval Studios"),
    "Under the Sign of the Black Mark": dict(artist="Bathory", release_year=1987,
                                             label="Black Mark Production", studio="Heavenshore Studio"),
    "Scream Bloody Gore": dict(artist="Death", release_year=1987, label="Combat Records",
                               studio="Music Grinder Studios"),
    "Altars of Madness": dict(artist="Morbid Angel", release_year=1989, label="Earache Records",
                              studio="Morrisound Recording"),
    "Vulgar Display of Power": dict(artist="Pantera", release_year=1992, label="Atco Records",
                                    studio="Pantego Sound Studio"),
    "Roots": dict(artist="Sepultura", release_year=1996, label="Roadrunner Records",
                  studio="Indigo Ranch"),
    "Keeper of the Seven Keys": dict(artist="Helloween", release_year=1987, label="Noise Records",
                                     studio="Horus Sound Studio"),
    "Epicus Doomicus Metallicus": dict(artist="Candlemass", release_year=1986, label="Black Dragon Records",
                                       studio="Thunderload Studios"),
    "Lightning to the Nations": dict(artist="Diamond Head", release_year=1980, label="Happy Face Records",
                                     studio="Vic's Studio"),
}

#: songs (reference prompt schema ``src/extraction/prompts.py:44-50``:
#: title/artist/album/bpm; CONTAINS_TRACK carries track_number,
#: ``src/schema/initialize_kuzu.py:186``). Titles deliberately never
#: collide with album titles or band names so alias-type disambiguation
#: stays out of the truth path.
SONGS: dict[str, dict] = {
    "Iron Man": dict(artist="Black Sabbath", album="Paranoid", track_number=4),
    "War Pigs": dict(artist="Black Sabbath", album="Paranoid", track_number=1),
    "Children of the Grave": dict(artist="Black Sabbath", album="Master of Reality", track_number=4),
    "Neon Knights": dict(artist="Black Sabbath", album="Heaven and Hell", track_number=1),
    "Run to the Hills": dict(artist="Iron Maiden", album="The Number of the Beast", track_number=5),
    "Hallowed Be Thy Name": dict(artist="Iron Maiden", album="The Number of the Beast", track_number=8),
    "Aces High": dict(artist="Iron Maiden", album="Powerslave", track_number=1),
    "Breaking the Law": dict(artist="Judas Priest", album="British Steel", track_number=3),
    "Living After Midnight": dict(artist="Judas Priest", album="British Steel", track_number=9),
    "Electric Eye": dict(artist="Judas Priest", album="Screaming for Vengeance", track_number=2),
    "A Touch of Evil": dict(artist="Judas Priest", album="Painkiller", track_number=9),
    "Battery": dict(artist="Metallica", album="Master of Puppets", track_number=1),
    "Orion": dict(artist="Metallica", album="Master of Puppets", track_number=7),
    "Fade to Black": dict(artist="Metallica", album="Ride the Lightning", track_number=3),
    "Creeping Death": dict(artist="Metallica", album="Ride the Lightning", track_number=6),
    "Hangar 18": dict(artist="Megadeth", album="Rust in Peace", track_number=2),
    "Tornado of Souls": dict(artist="Megadeth", album="Rust in Peace", track_number=6),
    "Angel of Death": dict(artist="Slayer", album="Reign in Blood", track_number=1),
    "Raining Blood": dict(artist="Slayer", album="Reign in Blood", track_number=10),
    "Love Me Like a Reptile": dict(artist="Motörhead", album="Ace of Spades", track_number=2),
    "Smoke on the Water": dict(artist="Deep Purple", album="Machine Head", track_number=5),
    "Highway Star": dict(artist="Deep Purple", album="Machine Head", track_number=1),
    "Massacre": dict(artist="Bathory", album="Under the Sign of the Black Mark", track_number=8),
    "Zombie Ritual": dict(artist="Death", album="Scream Bloody Gore", track_number=2),
    "Chapel of Ghouls": dict(artist="Morbid Angel", album="Altars of Madness", track_number=3),
    "Walk": dict(artist="Pantera", album="Vulgar Display of Power", track_number=3),
    "Roots Bloody Roots": dict(artist="Sepultura", album="Roots", track_number=1),
    "Eagle Fly Free": dict(artist="Helloween", album="Keeper of the Seven Keys", track_number=2),
    "Solitude": dict(artist="Candlemass", album="Epicus Doomicus Metallicus", track_number=1),
    "Am I Evil?": dict(artist="Diamond Head", album="Lightning to the Nations", track_number=4),
}

#: eras (schema initialize_kuzu.py Era node; ACTIVE_DURING /
#: EMERGED_DURING endpoints). Ranges tile the bands' formed_year span.
ERAS: dict[str, tuple[int, int]] = {
    "Early Metal Era": (1965, 1978),
    "NWOBHM Era": (1979, 1982),
    "Thrash Era": (1983, 1989),
    "Extreme Metal Era": (1990, 1999),
}

#: media outlets (DOCUMENTED_IN / FEATURED_IN endpoints).
MEDIA_OUTLETS: list[str] = ["Kerrang!", "Metal Hammer", "Sounds", "Rolling Stone"]

#: cultural events (PARTICIPATED_IN / INFLUENCED_EVENT endpoints).
CULTURAL_EVENTS: list[str] = [
    "Monsters of Rock", "Wacken Open Air", "US Festival",
    "Clash of the Titans",
]

#: musical characteristics (HAS_CHARACTERISTIC / USES_TECHNIQUE /
#: ALBUM_FEATURES endpoints); lowercase phrases, pattern-only.
CHARACTERISTICS: list[str] = [
    "blast beats", "palm muting", "tremolo picking", "growled vocals",
    "downtuned riffing",
]

#: viral phenomena (enhanced schema ViralPhenomenon; WENT_VIRAL).
VIRAL_PHENOMENA: list[str] = [
    "bedroom cover boom", "reaction video wave", "speedup remix trend",
    "meme compilation craze",
]

#: album producers (PRODUCED FROM Person TO Album).
PRODUCERS: dict[str, list[str]] = {
    "Martin Birch": ["The Number of the Beast", "Powerslave", "Heaven and Hell"],
    "Rick Rubin": ["Reign in Blood", "Vulgar Display of Power"],
    "Flemming Rasmussen": ["Master of Puppets", "Ride the Lightning"],
    "Scott Burns": ["Scream Bloody Gore", "Altars of Madness"],
    "Tom Allom": ["British Steel", "Screaming for Vengeance", "Painkiller"],
}
PRODUCER_BY_ALBUM: dict[str, str] = {
    a: p for p, albums in PRODUCERS.items() for a in albums
}


def era_of(year: int) -> str | None:
    for era, (lo, hi) in ERAS.items():
        if lo <= year <= hi:
            return era
    return None


#: enhanced-schema entity families
#: (``src/extraction/specialized_prompts.py``, node tables
#: ``metal_history_schema_enhanced.cypher:29-99,187-195``).
EQUIPMENT: dict[str, dict] = {
    "Boss HM-2": dict(type="pedal", manufacturer="Boss"),
    "Tube Screamer": dict(type="pedal", manufacturer="Ibanez"),
    "Marshall JCM800": dict(type="amp", manufacturer="Marshall"),
    "Peavey 5150": dict(type="amp", manufacturer="Peavey"),
    "Mesa Boogie Dual Rectifier": dict(type="amp", manufacturer="Mesa Boogie"),
    "Gibson SG": dict(type="guitar", manufacturer="Gibson"),
    "Jackson Rhoads": dict(type="guitar", manufacturer="Jackson"),
    "Fender Precision Bass": dict(type="bass", manufacturer="Fender"),
}

VENUES: dict[str, dict] = {
    "CBGB": dict(type="club", location="New York City"),
    "L'Amour": dict(type="club", location="Brooklyn"),
    "Helvete": dict(type="record_shop", location="Oslo"),
    "Ruthie's Inn": dict(type="club", location="Berkeley"),
    "Hammersmith Odeon": dict(type="club", location="London"),
    "The Marquee Club": dict(type="club", location="London"),
}

PLATFORMS: dict[str, dict] = {
    "MySpace": dict(type="social_media"),
    "YouTube": dict(type="video"),
    "Bandcamp": dict(type="streaming"),
    "MTV": dict(type="video"),
    "Headbangers Ball": dict(type="video"),
}

PRODUCTION_STYLES: dict[str, dict] = {
    "buzzsaw": dict(key_characteristics="HM-2 chainsaw guitar tone"),
    "scooped mids": dict(key_characteristics="mid-cut EQ thrash tone"),
    "reverb-drenched": dict(key_characteristics="cavernous ambience"),
    "lo-fi necro": dict(key_characteristics="raw 4-track production"),
}

SUBGENRES: dict[str, dict] = {
    "heavy metal": dict(era_start=1968, parents=["hard rock", "blues rock"]),
    "thrash metal": dict(era_start=1983, parents=["NWOBHM", "hardcore punk"]),
    "doom metal": dict(era_start=1970, parents=["heavy metal"]),
    "black metal": dict(era_start=1982, parents=["thrash metal", "speed metal"]),
    "death metal": dict(era_start=1985, parents=["thrash metal"]),
    "power metal": dict(era_start=1984, parents=["heavy metal", "speed metal"]),
    "speed metal": dict(era_start=1975, parents=["heavy metal"]),
    "groove metal": dict(era_start=1990, parents=["thrash metal"]),
    "progressive metal": dict(era_start=1985, parents=["heavy metal", "progressive rock"]),
    "hard rock": dict(era_start=1966, parents=["blues rock"]),
}

#: genre → (city, country) of origin, for ORIGINATED_IN sentences.
GENRE_ORIGINS: dict[str, tuple[str, str]] = {
    "heavy metal": ("Birmingham", "England"),
    "thrash metal": ("Los Angeles", "United States"),
    "black metal": ("Newcastle", "England"),
    "death metal": ("Tampa", "United States"),
    "doom metal": ("Birmingham", "England"),
    "power metal": ("Hamburg", "Germany"),
}

#: genre evolution edges, for EVOLVED_INTO sentences.
GENRE_EVOLUTION: list[tuple[str, str]] = [
    ("hard rock", "heavy metal"),
    ("heavy metal", "thrash metal"),
    ("thrash metal", "death metal"),
    ("thrash metal", "black metal"),
    ("heavy metal", "doom metal"),
    ("speed metal", "power metal"),
]

MOVEMENTS: dict[str, dict] = {
    "New Wave of British Heavy Metal": dict(
        start_decade=1970, bands=["Iron Maiden", "Def Leppard", "Saxon", "Diamond Head", "Venom"]),
    "Bay Area thrash": dict(start_decade=1980, bands=["Metallica", "Megadeth", "Slayer"]),
    "Norwegian black metal": dict(start_decade=1990, bands=["Mayhem", "Bathory"]),
    "Florida death metal": dict(start_decade=1980, bands=["Death", "Morbid Angel"]),
}

#: influence edges (influenced ← influencer), for INFLUENCED_BY sentences.
INFLUENCES: list[tuple[str, str]] = [
    ("Metallica", "Diamond Head"),
    ("Metallica", "Motörhead"),
    ("Megadeth", "Judas Priest"),
    ("Slayer", "Venom"),
    ("Iron Maiden", "Deep Purple"),
    ("Judas Priest", "Led Zeppelin"),
    ("Death", "Slayer"),
    ("Mayhem", "Venom"),
    ("Mayhem", "Bathory"),
    ("Pantera", "Black Sabbath"),
    ("Candlemass", "Black Sabbath"),
    ("Dream Theater", "Iron Maiden"),
    ("Helloween", "Judas Priest"),
    ("Sepultura", "Slayer"),
    ("Black Sabbath", "Led Zeppelin"),
]

INSTRUMENT_BY_ROLE: dict[str, str] = {
    "guitarist": "guitar",
    "bassist": "bass",
    "drummer": "drums",
    "vocalist": "vocals",
    "singer": "vocals",
    "keyboardist": "keyboards",
}
ROLE_BY_INSTRUMENT: dict[str, str] = {
    "guitar": "guitarist", "bass": "bassist", "drums": "drummer",
    "vocals": "vocalist", "keyboards": "keyboardist",
}

STUDIOS = sorted({a["studio"] for a in ALBUMS.values()})
LABELS = sorted({a["label"] for a in ALBUMS.values()})
LOCATIONS: dict[str, str] = {  # city -> country
    **{b["origin_city"]: b["origin_country"] for b in BANDS.values()},
}

# --- alias dictionary (the broadcast dim table) --------------------------


def build_alias_rows() -> list[dict]:
    """Flatten the gazetteer into alias-dictionary rows
    ``(alias_norm, entity_type, canonical_name, context_tokens)``.

    ``context_tokens`` feed the TF-IDF-style context score used to
    disambiguate aliases shared across types (e.g. the band "Paranoid"
    chunk vs the album "Paranoid").
    """
    rows: list[dict] = []

    def add(alias: str, etype: str, canonical: str, context: list[str]) -> None:
        rows.append(dict(
            alias_norm=alias.lower().strip(),
            entity_type=etype,
            canonical_name=canonical,
            context_tokens=sorted({t.lower() for t in context}),
        ))

    for name, b in BANDS.items():
        ctx = ["band", "formed", b["origin_city"], b["origin_country"], *b["genres"]]
        for alias in [name, *b["aliases"]]:
            add(alias, "bands", name, ctx)
    for name, p in PEOPLE.items():
        ctx = ["member", *p["instruments"], *p["bands"]]
        add(name, "people", name, ctx)
    for title, a in ALBUMS.items():
        ctx = ["album", "released", a["artist"], str(a["release_year"])]
        add(title, "albums", title, ctx)
    for title, s in SONGS.items():
        add(title, "songs", title, ["track", "song", "features"])
    for name in SUBGENRES:
        add(name, "subgenres", name, ["genre", "metal", "style"])
    for city, country in LOCATIONS.items():
        add(city, "locations", city, ["scene", country])
    for name, m in MOVEMENTS.items():
        add(name, "movements", name, ["movement", *m["bands"][:3]])
    for name in STUDIOS:
        add(name, "studios", name, ["recorded", "studio"])
    for name in LABELS:
        add(name, "labels", name, ["label", "released"])
    for name in EQUIPMENT:
        add(name, "equipment", name, ["recorded", "gear", "sound"])
    for name in VENUES:
        add(name, "venues", name, ["played", "venue", "club"])
    for name in PLATFORMS:
        add(name, "platforms", name, ["promoted", "viral", "platform"])
    for name in ERAS:
        add(name, "eras", name, ["era", "during", "active"])
    for name in MEDIA_OUTLETS:
        add(name, "media_outlets", name, ["documented", "featured", "press"])
    for name in CULTURAL_EVENTS:
        add(name, "events", name, ["festival", "participated"])
    for name in PRODUCERS:
        add(name, "people", name, ["producer", "produced", "album"])
    return rows
