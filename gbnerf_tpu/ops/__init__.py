from .resample import sample_pdf_onehot, merge_sorted_onehot

__all__ = ["sample_pdf_onehot", "merge_sorted_onehot"]
