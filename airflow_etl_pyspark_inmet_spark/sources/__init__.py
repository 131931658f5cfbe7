from .inmet_csv import read_inmet_stations, read_inmet_measurements  # noqa: F401
