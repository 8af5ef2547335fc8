"""Source-only-checkpoint evaluation entry point (reference: source_tester.py)
— same as adapt_test but scores with F1 only (SURVEY.md section 3.5)."""

from mcseg_tpu.cli import adapt_test


def main(argv=None):
    # F1 only by default; --use_f2 opts into classifier averaging.
    return adapt_test.main(argv, average_classifiers=False)


if __name__ == "__main__":
    main()
