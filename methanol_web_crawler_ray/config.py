"""Engine configuration — the Python equivalent of the reference's config
language (libmethaconfig: src/libmethaconfig/conf.c, classes wired in
src/libmetha/metha.c:132-185).

``crawler``/``filetype`` classes become :class:`EngineConfig` holding
``matchkit.Crawler`` / ``matchkit.Filetype`` dataclasses; the language's
``extend:`` / ``override:`` keywords become dict merges (``extend`` updates
an existing object's fields, ``override`` replaces it) and ``include``
becomes composition of config dicts.

``DEFAULT_CONFIG`` mirrors /root/reference/conf/default.conf (+ css.conf's
``css`` filetype and image.conf's target-only ``image`` filetype, used by
the fixtures and tests).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Optional

from .functions.matchkit import Crawler, Filetype


@dataclass
class EngineConfig:
    crawlers: Dict[str, Crawler] = field(default_factory=dict)
    filetypes: Dict[str, Filetype] = field(default_factory=dict)
    default_crawler: str = "default"
    user_agent: str = "Methabot"
    # politeness modes (metha.c:71-79): seconds between transfers per host
    mode: str = "aggressive"  # aggressive=0s, friendly=10s, coward=30s
    # offline politeness budget: simulated seconds per scheduling round;
    # a host with crawl-delay d gets floor(round_seconds/max(d,1)) slots
    round_seconds: int = 16
    # Faithful libmetha keeps LM_URL_EXTERNAL on parked URLs, so an external
    # host's children re-park into its own (never re-pended) list and are
    # lost — external hosts crawl exactly one level (url.c:297 flag
    # inheritance + urlengine.c:476-502).  The reference's own DISTRIBUTED
    # mode seeds each host fresh (mn-slaved START <url> → lm_url_set, no
    # flag), which clears it; True reproduces that daemon-mode behavior.
    clear_external_on_activate: bool = False

    # GET/robots vs HEAD (multipeek) timers — metha.c:70-78 timer_vals:
    # friendly = 10 s GET / 2 s HEAD, coward = 30 s / 5 s
    MODE_DELAYS = {"aggressive": 0.0, "friendly": 10.0, "coward": 30.0}
    MODE_HEAD_DELAYS = {"aggressive": 0.0, "friendly": 2.0, "coward": 5.0}

    def extend_filetype(self, name: str, **kw) -> None:
        """config 'extend: filetype[name] { ... }' (conf.c extend keyword)."""
        self.filetypes[name] = replace(self.filetypes[name], **kw)

    def extend_crawler(self, name: str, **kw) -> None:
        self.crawlers[name] = replace(self.crawlers[name], **kw)

    def override_filetype(self, ft: Filetype) -> None:
        self.filetypes[ft.name] = ft

    def crawler(self, name: Optional[str] = None) -> Crawler:
        return self.crawlers[name or self.default_crawler]

    @property
    def base_delay(self) -> float:
        return self.MODE_DELAYS.get(self.mode, 0.0)

    @property
    def head_delay(self) -> float:
        return self.MODE_HEAD_DELAYS.get(self.mode, 0.0)


def default_config(**crawler_overrides) -> EngineConfig:
    """Mirror of conf/default.conf + css.conf + image.conf."""
    filetypes = {
        "html": Filetype(
            name="html",
            extensions=("htm", "html", "php", "asp", "aspx", "jsp"),
            mimetypes=(
                "text/html",
                "text/xml",
                "application/xhtml+xml",
                "application/xml",
            ),
            attributes=("html", "title"),
            # default.conf uses parser="html" alone; the flagship chain adds
            # the title.conf idiom (utf8conv + a title extractor) and
            # entityconv so the final buffer IS the byte-identical
            # extracted-text invariant (FIXTURES.md §1, SURVEY §2 M10/M11).
            # Link extraction ("html") runs FIRST, over the raw bytes.
            parser="html, utf8conv, entityconv, title",
        ),
        "text": Filetype(
            name="text",
            extensions=("txt",),
            mimetypes=("text/plain",),
            parser="text",
        ),
        "css": Filetype(
            name="css",
            extensions=("css",),
            mimetypes=("text/css",),
            parser="css",
        ),
        # image.conf: no parser/handler → matches report as targets directly
        # (lm_worker_bind_url: worker.c:712-713)
        "image": Filetype(
            name="image",
            extensions=("jpeg", "jpg", "bmp", "gif", "png", "mng", "svg"),
            mimetypes=("image/",),
        ),
    }
    kw = dict(
        filetypes=("html", "text", "css", "image"),
        dir_url="@html",
        extless_url="@html",
        dynamic_url="@html",
        unknown_url="discard",
        depth_limit=3,
        external=False,
        robotstxt=True,
    )
    kw.update(crawler_overrides)
    crawler = Crawler(name="default", **kw)
    return EngineConfig(crawlers={"default": crawler}, filetypes=filetypes)
