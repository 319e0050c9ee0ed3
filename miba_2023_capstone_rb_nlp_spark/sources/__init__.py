"""Acquisition sources (SURVEY §2.1 S4-S10): search-engine link
scrapers (driver-side fetch → DataFrame) and distributed per-URL
content extraction (mapInPandas). Network I/O is injected
(``fetcher``) so tests run on canned HTML / file:// URLs; the
politeness, pagination, and pushdown mechanics are real."""
