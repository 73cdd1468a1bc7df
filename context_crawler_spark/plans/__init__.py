"""Plan layer: the BSP crawl-round driver (SURVEY.md §7.1)."""
