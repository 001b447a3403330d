// Package kjarni — Go binding over the kjarni C ABI (libkjarni.so).
//
// Rebuild of kjarni-ffi/bindings/go: the same surface (NewClassifier,
// NewEmbedder, NewChat, ...) via cgo against native/kjarni.h.
//
// Build: ensure libkjarni.so is on the linker path, then `go build`.
package kjarni

/*
#cgo LDFLAGS: -lkjarni
#include <stdlib.h>
#include "kjarni.h"
*/
import "C"

import (
	"encoding/json"
	"errors"
	"fmt"
	"unsafe"
)

func init() {
	if C.kjarni_init() != 0 {
		panic("kjarni_init failed: " + lastError())
	}
}

func lastError() string {
	return C.GoString(C.kjarni_last_error())
}

// Version returns the native library version.
func Version() string {
	return C.GoString(C.kjarni_version())
}

type handle struct {
	h C.longlong
}

func newHandle(task, model string) (*handle, error) {
	opts := "{}"
	if model != "" {
		b, _ := json.Marshal(map[string]string{"model": model})
		opts = string(b)
	}
	ctask := C.CString(task)
	copts := C.CString(opts)
	defer C.free(unsafe.Pointer(ctask))
	defer C.free(unsafe.Pointer(copts))
	h := C.kjarni_new(ctask, copts)
	if h == 0 {
		return nil, errors.New(lastError())
	}
	return &handle{h: h}, nil
}

func (h *handle) call(method string, args any) (map[string]any, error) {
	b, err := json.Marshal(args)
	if err != nil {
		return nil, err
	}
	cm := C.CString(method)
	ca := C.CString(string(b))
	defer C.free(unsafe.Pointer(cm))
	defer C.free(unsafe.Pointer(ca))
	out := C.kjarni_call(h.h, cm, ca)
	if out == nil {
		return nil, errors.New(lastError())
	}
	defer C.kjarni_string_free(out)
	var result map[string]any
	if err := json.Unmarshal([]byte(C.GoString(out)), &result); err != nil {
		return nil, err
	}
	return result, nil
}

// Close frees the underlying native handle.
func (h *handle) Close() {
	if h.h != 0 {
		C.kjarni_free(h.h)
		h.h = 0
	}
}

// ---------------------------------------------------------------------------
// Classifier
// ---------------------------------------------------------------------------

type Classifier struct{ *handle }

type LabelScore struct {
	Label string
	Score float64
}

type ClassificationResult struct {
	Label     string
	Score     float64
	AllScores []LabelScore
}

func NewClassifier(model string) (*Classifier, error) {
	h, err := newHandle("classifier", model)
	if err != nil {
		return nil, err
	}
	return &Classifier{h}, nil
}

func (c *Classifier) Classify(text string) (*ClassificationResult, error) {
	out, err := c.call("classify", map[string]string{"text": text})
	if err != nil {
		return nil, err
	}
	res := &ClassificationResult{
		Label: out["label"].(string),
		Score: out["score"].(float64),
	}
	if raw, ok := out["all_scores"].([]any); ok {
		for _, pair := range raw {
			p := pair.([]any)
			res.AllScores = append(res.AllScores, LabelScore{
				Label: p[0].(string), Score: p[1].(float64)})
		}
	}
	return res, nil
}

// ---------------------------------------------------------------------------
// Embedder
// ---------------------------------------------------------------------------

type Embedder struct{ *handle }

func NewEmbedder(model string) (*Embedder, error) {
	h, err := newHandle("embedder", model)
	if err != nil {
		return nil, err
	}
	return &Embedder{h}, nil
}

func (e *Embedder) Embed(text string) ([]float32, error) {
	out, err := e.call("embed", map[string]string{"text": text})
	if err != nil {
		return nil, err
	}
	raw := out["embedding"].([]any)
	vec := make([]float32, len(raw))
	for i, v := range raw {
		vec[i] = float32(v.(float64))
	}
	return vec, nil
}

func (e *Embedder) Similarity(a, b string) (float64, error) {
	out, err := e.call("similarity", map[string]string{"a": a, "b": b})
	if err != nil {
		return 0, err
	}
	return out["similarity"].(float64), nil
}

// ---------------------------------------------------------------------------
// Chat
// ---------------------------------------------------------------------------

type Chat struct{ *handle }

func NewChat(model string) (*Chat, error) {
	h, err := newHandle("chat", model)
	if err != nil {
		return nil, err
	}
	return &Chat{h}, nil
}

func (c *Chat) Send(message string) (string, error) {
	out, err := c.call("send", map[string]string{"message": message})
	if err != nil {
		return "", err
	}
	return out["reply"].(string), nil
}

// Stream sends a message and invokes fn per generated token; returning false
// cancels generation.
func (c *Chat) Stream(message string, fn func(token string) bool) error {
	b, _ := json.Marshal(map[string]string{"message": message})
	cm := C.CString("stream")
	ca := C.CString(string(b))
	defer C.free(unsafe.Pointer(cm))
	defer C.free(unsafe.Pointer(ca))
	if C.kjarni_stream_start(c.h.h, cm, ca) != 0 {
		return errors.New(lastError())
	}
	for {
		tok := C.kjarni_stream_next(c.h.h)
		if tok == nil {
			return nil
		}
		s := C.GoString(tok)
		C.kjarni_string_free(tok)
		if !fn(s) {
			C.kjarni_stream_cancel(c.h.h)
			return nil
		}
	}
}

// ---------------------------------------------------------------------------
// Reranker / Indexer / Searcher
// ---------------------------------------------------------------------------

type Reranker struct{ *handle }

type RerankResult struct {
	Index int
	Score float64
	Text  string
}

func NewReranker(model string) (*Reranker, error) {
	h, err := newHandle("reranker", model)
	if err != nil {
		return nil, err
	}
	return &Reranker{h}, nil
}

func (r *Reranker) Rerank(query string, documents []string) ([]RerankResult, error) {
	out, err := r.call("rerank", map[string]any{
		"query": query, "documents": documents})
	if err != nil {
		return nil, err
	}
	var results []RerankResult
	for _, item := range out["results"].([]any) {
		m := item.(map[string]any)
		results = append(results, RerankResult{
			Index: int(m["index"].(float64)),
			Score: m["score"].(float64),
			Text:  m["text"].(string),
		})
	}
	return results, nil
}

type Indexer struct{ *handle }

func NewIndexer(model string) (*Indexer, error) {
	h, err := newHandle("indexer", model)
	if err != nil {
		return nil, err
	}
	return &Indexer{h}, nil
}

func (i *Indexer) Create(indexPath string, paths []string) error {
	_, err := i.call("create", map[string]any{
		"index_path": indexPath, "paths": paths})
	return err
}

type SearchMode string

const (
	Keyword  SearchMode = "keyword"
	Semantic SearchMode = "semantic"
	Hybrid   SearchMode = "hybrid"
)

type Searcher struct{ *handle }

type SearchResult struct {
	Score float64
	Text  string
}

func NewSearcher(model, rerankerModel string) (*Searcher, error) {
	h, err := newHandle("searcher", model)
	if err != nil {
		return nil, err
	}
	_ = rerankerModel // reranker model plumbed via options in a later revision
	return &Searcher{h}, nil
}

func (s *Searcher) Search(indexPath, query string, mode SearchMode) ([]SearchResult, error) {
	out, err := s.call("search", map[string]any{
		"index_path": indexPath, "query": query, "mode": string(mode)})
	if err != nil {
		return nil, err
	}
	var results []SearchResult
	for _, item := range out["results"].([]any) {
		m := item.(map[string]any)
		results = append(results, SearchResult{
			Score: m["score"].(float64), Text: m["text"].(string)})
	}
	return results, nil
}

var _ = fmt.Sprintf // keep fmt imported for future use
