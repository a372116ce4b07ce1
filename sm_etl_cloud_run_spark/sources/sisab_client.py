"""SISAB report-request client (SURVEY §2.1 S4) — transport-injectable.

The reference drives the SISAB JSF web form statefully
(utilitarios/sisab_producao_modelos.py:132-338): GET the landing page,
capture cookies + `javax.faces.ViewState`, resolve human-readable
filter labels to form option codes, then POST the assembled payload and
receive the report as ISO-8859-1 CSV-ish text.

This module re-expresses that state machine with no HTTP library baked
in: the caller injects a `transport(method, url, *, headers, cookies,
data) -> (text, cookies)` callable (tests use a fake; production wires
`requests`/`urllib`). Fetch stays driver-side — the downloaded text
then enters the distributed plan via `parse_sisab_report` (S5).

Validation parity with the reference:
- 1–12 competências per request, each must exist in the form's options
  (single unavailable → error; several → skip with a warning);
- only the 'Brasil' geographic level;
- `tipo_producao` required unless a row/column variable is
  'Tipo de Produção';
- an age range requires `idade_tipo` ('Ano' or 'Dias').
"""

from __future__ import annotations

import re
import unicodedata
import warnings
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from datetime import date
from html.parser import HTMLParser

Transport = Callable[..., tuple[str, dict]]

SISAB_PRODUCAO_URL = (
    "https://sisab.saude.gov.br/paginas/acessoRestrito/relatorio/federal/"
    "saude/RelSauProducao.xhtml"
)


def _norm(label: str) -> str:
    """Case/accents/edge-punctuation-insensitive label comparison key."""
    s = unicodedata.normalize("NFKD", label)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    return re.sub(r"^\W+|\W+$", "", s.strip(), flags=re.UNICODE).lower()


class _PageParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.selects: dict[str, dict[str, str]] = {}  # select id -> {option text: value}
        self.inputs: dict[str, dict[str, str]] = {}  # input id -> attrs
        self.labels: dict[str, str] = {}  # label 'for' -> text
        self._select: str | None = None
        self._option_value: str | None = None
        self._label_for: str | None = None
        self._text: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        if tag == "select" and a.get("id"):
            self._select = a["id"]
            self.selects[self._select] = {}
        elif tag == "option" and self._select is not None:
            self._option_value = a.get("value", "")
            self._text = []
        elif tag == "input" and (a.get("id") or a.get("name")):
            self.inputs[a.get("id") or a.get("name")] = a
        elif tag == "label" and a.get("for"):
            self._label_for = a["for"]
            self._text = []

    def handle_data(self, data: str) -> None:
        self._text.append(data)

    def handle_endtag(self, tag: str) -> None:
        text = "".join(self._text).strip()
        if tag == "option" and self._select is not None and self._option_value is not None:
            self.selects[self._select][text] = self._option_value
            self._option_value = None
        elif tag == "select":
            self._select = None
        elif tag == "label" and self._label_for is not None:
            self.labels[self._label_for] = text
            self._label_for = None
        self._text = []


@dataclass
class FormPage:
    """Parsed JSF landing page: view state, selection boxes, labels."""

    view_state: str
    selects: dict[str, dict[str, str]]
    inputs: dict[str, dict[str, str]]
    labels: dict[str, str]

    @classmethod
    def from_html(cls, html: str) -> FormPage:
        p = _PageParser()
        p.feed(html)
        vs = p.inputs.get("javax.faces.ViewState", {}).get("value")
        if vs is None:
            raise ValueError("landing page has no javax.faces.ViewState input")
        return cls(vs, p.selects, p.inputs, p.labels)

    def option_code(self, select_id: str, label: str) -> str:
        options = self.selects.get(select_id, {})
        for text, value in options.items():
            if _norm(text) == _norm(label):
                return value
        raise LookupError(f"option {label!r} not found in box {select_id!r}")

    def option_values(self, select_id: str) -> set[str]:
        return set(self.selects.get(select_id, {}).values())

    def option_labels(self, select_id: str) -> list[str]:
        return list(self.selects.get(select_id, {}))

    def select_id_for_label(self, box_label: str) -> str:
        for for_id, text in self.labels.items():
            if _norm(text) == _norm(box_label) and for_id in self.selects:
                return for_id
        raise LookupError(f"selection box labelled {box_label!r} not found")

    def radio_code(self, name_prefix: str, label: str) -> str:
        """e.g. idade_tipo: label 'Ano(s)'/'Dias' next to a tpIdade* input."""
        for for_id, text in self.labels.items():
            if for_id.startswith(name_prefix) and _norm(text).startswith(_norm(label)[:3]):
                inp = self.inputs.get(for_id)
                if inp and "value" in inp:
                    return inp["value"]
        raise LookupError(f"radio {label!r} with prefix {name_prefix!r} not found")


_COMPETENCIAS_BOX = "j_idt76"
_MAX_COMPETENCIAS = 12


@dataclass
class SisabReportRequest:
    """Assembles the production-report POST payload from one landing page.

    Mirrors the reference's `SisabRelatorioProducao` configuration rules;
    `payload` is the ordered (key, value) form body.
    """

    page: FormPage
    competencias: list[date]
    unidade_geografica: str = "Brasil"
    variavel_linha: str = "Brasil"
    variavel_coluna: str = "Tipo de Produção"
    faixa_etaria: tuple[int, int] = (0, 0)
    idade_tipo: str | None = None
    tipo_producao: str | None = None
    selecoes_adicionais: dict[str, Iterable[str] | str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.competencias or len(self.competencias) > _MAX_COMPETENCIAS:
            raise ValueError(
                f"informe de 1 a {_MAX_COMPETENCIAS} competências "
                f"({len(self.competencias or [])} informadas)"
            )
        if _norm(self.unidade_geografica) != "brasil":
            raise NotImplementedError("apenas o nível 'Brasil' é suportado")
        if sum(self.faixa_etaria) > 0 and not self.idade_tipo:
            raise ValueError("faixa etária exige `idade_tipo` ('Ano' ou 'Dias')")
        if (
            not self.tipo_producao
            and _norm(self.variavel_linha) != _norm("Tipo de Produção")
            and _norm(self.variavel_coluna) != _norm("Tipo de Produção")
        ):
            raise ValueError(
                "`tipo_producao` é obrigatório quando nem linha nem coluna "
                "é 'Tipo de Produção'"
            )
        self.payload = self._build_payload()

    def _competencia_codes(self) -> list[str]:
        available = self.page.option_values(_COMPETENCIAS_BOX)
        codes: list[str] = []
        for comp in self.competencias:
            code = f"{comp:%Y%m}"
            if code in available:
                codes.append(code)
                continue
            msg = f"competência {comp:%m/%Y} indisponível no sistema"
            if len(self.competencias) == 1:
                raise ValueError(msg)
            warnings.warn(msg + " — ignorando", stacklevel=3)
        return codes

    def _build_payload(self) -> list[tuple[str, str]]:
        page = self.page
        payload: list[tuple[str, str]] = [
            ("j_idt44", "j_idt44"),
            ("lsCid", ""),
            ("dtBasicExample_length", "10"),
            ("lsSigtap", ""),
            ("td-ls-sigtap_length", "10"),
            ("javax.faces.ViewState", page.view_state),
            ("j_idt192", "j_idt192"),
            ("unidGeo", page.option_code("unidGeo", self.unidade_geografica)),
        ]
        payload += [(_COMPETENCIAS_BOX, c) for c in self._competencia_codes()]
        payload.append(("selectLinha", page.option_code("selectLinha", self.variavel_linha)))
        payload.append(("selectcoluna", page.option_code("selectcoluna", self.variavel_coluna)))
        if self.idade_tipo:
            payload.append(("tpIdade", page.radio_code("tpIdade", self.idade_tipo)))
        payload += [
            ("idadeInicio", str(self.faixa_etaria[0])),
            ("idadeFim", str(self.faixa_etaria[1])),
        ]
        if self.tipo_producao:
            payload.append(("tpProducao", page.option_code("tpProducao", self.tipo_producao)))
        for box_label, choices in self.selecoes_adicionais.items():
            if not choices:
                continue
            select_id = page.select_id_for_label(box_label)
            if isinstance(choices, str) and _norm(choices) == "selecionar todos":
                choices = page.option_labels(select_id)
            payload += [(select_id, page.option_code(select_id, c)) for c in choices]
        return payload


class SisabSession:
    """Driver-side fetch: GET the form page, then POST report requests."""

    def __init__(self, transport: Transport, url: str = SISAB_PRODUCAO_URL) -> None:
        self._transport = transport
        self._url = url
        text, cookies = transport("GET", url)
        self._cookies = dict(cookies)
        self.page = FormPage.from_html(text)

    def download(self, request: SisabReportRequest, *, timeout: int = 120) -> str:
        url = self._url
        if "JSESSIONID" in self._cookies:
            url += ";jsessionid=" + self._cookies["JSESSIONID"]
        text, _ = self._transport(
            "POST",
            url,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            cookies=self._cookies,
            data=request.payload,
            timeout=timeout,
        )
        return text
