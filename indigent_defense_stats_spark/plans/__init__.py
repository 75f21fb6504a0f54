"""Crawl plans: distributed URL frontier, bloom seen-filter, wave loop."""
