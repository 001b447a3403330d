// Minimal DOM shim for executing web/kjarni-search.js under jsvm
// (tests/test_search_widget.py). Implements exactly the surface the widget
// touches: createElement / getElementById / head / body / addEventListener
// on document, and elements with childNodes, classList, listeners, and the
// scalar properties the widget assigns. Not a DOM — a test double.

class ShimClassList {
  constructor(el) {
    this.el = el;
  }
  _parts() {
    return this.el.className.split(" ").filter((c) => c.length > 0);
  }
  add(c) {
    const parts = this._parts();
    if (!parts.includes(c)) parts.push(c);
    this.el.className = parts.join(" ");
  }
  remove(c) {
    this.el.className = this._parts().filter((x) => x !== c).join(" ");
  }
  contains(c) {
    return this._parts().includes(c);
  }
}

class ShimElement {
  constructor(doc, tag) {
    this._doc = doc;
    this.tagName = tag;
    this.childNodes = [];
    this.id = "";
    this.className = "";
    this.textContent = "";
    this.value = "";
    this.href = "";
    this.type = "";
    this.placeholder = "";
    this.disabled = false;
    this.style = {};
    this._listeners = {};
    this.classList = new ShimClassList(this);
  }
  appendChild(c) {
    this.childNodes.push(c);
    return c;
  }
  removeChild(c) {
    const i = this.childNodes.indexOf(c);
    if (i >= 0) this.childNodes.splice(i, 1);
    return c;
  }
  addEventListener(type, fn) {
    if (!this._listeners[type]) this._listeners[type] = [];
    this._listeners[type].push(fn);
  }
  dispatchEvent(type, ev) {
    for (const fn of this._listeners[type] || []) fn(ev);
  }
  focus() {
    this._doc.activeElement = this;
  }
}

class ShimDocument {
  constructor() {
    this._all = [];
    this._listeners = {};
    this.head = this.createElement("head");
    this.body = this.createElement("body");
    this.activeElement = null;
  }
  createElement(tag) {
    const el = new ShimElement(this, tag);
    this._all.push(el);
    return el;
  }
  getElementById(id) {
    for (const el of this._all) {
      if (el.id === id) return el;
    }
    return null;
  }
  addEventListener(type, fn) {
    if (!this._listeners[type]) this._listeners[type] = [];
    this._listeners[type].push(fn);
  }
  dispatchEvent(type, ev) {
    for (const fn of this._listeners[type] || []) fn(ev);
  }
}

const document = new ShimDocument();

const performance = { now: () => 0 };

// debounce helpers: jsvm is synchronous, run callbacks immediately
function setTimeout(fn, _ms) {
  fn();
  return 0;
}
function clearTimeout(_id) {}
