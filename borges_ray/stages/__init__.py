"""Ray Data stages of the crawl engine (politeness, fetch, parse, links)."""
