# nat-tpu — convenience targets (the reference's Makefile installs man pages;
# we keep that plus test/bench/native targets).

PREFIX ?= /usr/local
MANDIR ?= $(PREFIX)/share/man

.PHONY: test bench install-man install native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

install-man:
	install -d $(MANDIR)/man1 $(MANDIR)/man3 $(MANDIR)/man5
	install -m 644 man/nat-tpu.1 $(MANDIR)/man1/
	install -m 644 man/nat_tpu.3 $(MANDIR)/man3/
	install -m 644 man/lam_audio_tokens.5 $(MANDIR)/man5/

install: install-man
	pip install -e .

native:
	$(MAKE) -C native

clean:
	rm -rf build dist *.egg-info nat_tpu/**/__pycache__ native/*.so
