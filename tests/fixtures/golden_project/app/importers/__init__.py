"""taskforge package."""
