"""Web-Mercator tile math and spatial filters — the reference's
distinguishing domain (SURVEY §2.9), as native Column expressions."""
