"""End-to-end job plans and fixture-table adaptors."""
