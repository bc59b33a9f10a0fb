"""Job plans: the batch-iterative BFS crawl wave loop."""
