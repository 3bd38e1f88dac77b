from .pages import extract_links, url_dictionary, pages_to_edges, extracted_text  # noqa: F401
