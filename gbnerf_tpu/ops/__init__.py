from .resample import (merge_sorted_fast, merge_sorted_onehot,
                       sample_pdf_fast, sample_pdf_onehot)

__all__ = ["sample_pdf_fast", "merge_sorted_fast",
           "sample_pdf_onehot", "merge_sorted_onehot"]
